"""BSARec-side offline preprocessing + visualization utilities."""

import json

import numpy as np

from bsarec_tpu.data.preprocess import (
    build_interactions,
    check_kcore,
    filter_kcore,
    id_map,
    parse_amazon,
    parse_lastfm,
    parse_ml1m,
    process_dataset,
    write_corpus,
)
from bsarec_tpu.ops.frequency import lowpass_projection_matrix
from bsarec_tpu.utils.visualize import (
    attention_spectral_response,
    filter_spectral_response,
    layerwise_cosine_similarity,
    layerwise_singular_values,
)


def test_build_interactions_sorts_and_tracks_gaps():
    triples = [("u1", "a", 30), ("u1", "b", 10), ("u1", "c", 20)]
    items, gaps = build_interactions(triples)
    assert items["u1"] == ["b", "c", "a"]
    assert gaps["u1"] == [0, 10, 10]


def test_kcore_filter_merges_gaps():
    # item 'x' appears once -> removed, its gap merges into successor
    user_items = {
        "u1": ["a", "x", "b", "a", "b"],
        "u2": ["a", "b", "a", "b", "a"],
        "u3": ["b", "a", "b", "a", "b"],
    }
    gaps = {"u1": [0, 1, 2, 3, 4], "u2": [0] * 5, "u3": [0] * 5}
    filtered, g = filter_kcore(user_items, gaps, user_core=2, item_core=2)
    assert "x" not in [i for v in filtered.values() for i in v]
    assert filtered["u1"] == ["a", "b", "a", "b"]
    assert g["u1"] == [0, 3, 3, 4]  # removed gap 1 merged into next (2 -> 3)


def test_id_map_first_appearance_order():
    mapped, n_u, n_i, maps = id_map({"uA": ["z", "y"], "uB": ["y", "x"]})
    assert mapped == {1: [1, 2], 2: [2, 3]}
    assert (n_u, n_i) == (2, 3)


def test_amazon_pipeline_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    raw = tmp_path / "raw.json"
    with open(raw, "w") as fh:
        for k in range(800):
            fh.write(json.dumps({
                "reviewerID": f"u{rng.integers(0, 40)}",
                "asin": f"i{rng.integers(0, 30)}",
                "overall": float(rng.integers(1, 6)),
                "unixReviewTime": int(1.4e9 + rng.integers(0, 10**7)),
            }) + "\n")
    out = tmp_path / "Beauty.txt"
    stats = process_dataset("Beauty", str(raw), str(out))
    assert stats["users"] > 0 and stats["items"] > 0
    # output parses back through the training-corpus loader
    from bsarec_tpu.data.corpus import load_corpus

    corpus = load_corpus(out)
    assert corpus.num_users == stats["users"]
    assert all(len(s) >= 5 for s in corpus.lists)


def test_ml1m_and_lastfm_parsers(tmp_path):
    ml = tmp_path / "ratings.dat"
    ml.write_text("1::10::5::100\n1::11::3::50\n")
    assert parse_ml1m(str(ml)) == [("1", "10", 100), ("1", "11", 50)]

    lf = tmp_path / "lastfm.dat"
    lf.write_text("header\n1\t7\t99\t1000\n1\t7\t98\t2000\n1\t8\t97\t3000\n")
    triples = parse_lastfm(str(lf))
    items, _ = build_interactions(triples, dedup_items=True)
    assert items["1"] == ["7", "8"]  # duplicate artist dropped


def test_spectral_response_of_lowpass_projection():
    """The BSARec low-pass projection must pass exactly the kept bins."""
    proj = lowpass_projection_matrix(50, 5)  # keeps bins 0,1,2
    resp = attention_spectral_response(proj)
    assert np.all(resp[:3] > 0.99)
    # full-FFT diag covers conjugate bins too: 50-1, 50-2 mirror 1, 2
    assert np.all(resp[48:] > 0.99)
    assert np.all(resp[4:47] < 1e-6)


def test_visualization_metrics_shapes():
    rng = np.random.default_rng(0)
    outs = [rng.normal(size=(4, 10, 8)) for _ in range(3)]
    sims = layerwise_cosine_similarity(outs)
    assert len(sims) == 3 and all(-1 <= s <= 1 for s in sims)
    # identical rows -> similarity 1
    const = np.ones((2, 10, 8))
    assert abs(layerwise_cosine_similarity([const])[0] - 1.0) < 1e-9
    svs = layerwise_singular_values(outs)
    assert all(abs(s[0] - 1.0) < 1e-9 for s in svs)
    resp = filter_spectral_response(rng.normal(size=(1, 26, 8)), rng.normal(size=(1, 26, 8)))
    assert resp.shape == (26,)


def test_preprocess_cli_end_to_end(tmp_path):
    """`python -m bsarec_tpu.data.preprocess` CLI: raw file -> corpus
    .txt, missing raw files reported not fatal (process.sh analog)."""
    import json as _json

    from bsarec_tpu.data.preprocess import main

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for u in range(30):
        for i in rng.choice(25, size=rng.integers(6, 15), replace=False):
            rows.append({"reviewerID": f"u{u}", "asin": f"i{i}",
                         "overall": 5.0, "unixReviewTime": int(rng.integers(1e9, 1.1e9))})
    with open(raw / "reviews_Beauty_5.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")

    results = main([
        "--dataset", "all", "--raw_dir", str(raw), "--out_dir", str(tmp_path / "out"),
    ])
    assert set(results) == {"Beauty"}  # only dataset with a raw file
    lines = (tmp_path / "out" / "Beauty.txt").read_text().strip().splitlines()
    assert len(lines) == results["Beauty"]["users"]
    first = lines[0].split()
    assert all(tok.isdigit() for tok in first)
    assert len(first) - 1 >= 5  # user_core survived


def test_fig2_attention_response_uniform_attention_is_pure_dc():
    """Notebook-exact Fig 2(b) helper (`figure2.ipynb` §2): a uniform
    averaging attention map passes ONLY the 0-frequency bin, and the
    identity map passes all bins equally."""
    from bsarec_tpu.utils.visualize import fig2_attention_response

    length = 50
    uniform = np.full((length, length), 1.0 / length)
    resp = fig2_attention_response(uniform)
    assert resp.shape == (length // 2 + 1,)
    assert resp[0] > 1e-3
    np.testing.assert_allclose(resp[1:], 0.0, atol=1e-12)

    ident = fig2_attention_response(np.eye(length))
    np.testing.assert_allclose(ident, ident[0], rtol=1e-9)


def test_fig2_fftshift_mirrors_one_sided_response():
    from bsarec_tpu.utils.visualize import fig2_fftshift

    arr = np.arange(26, dtype=np.float64)
    x, y = fig2_fftshift(arr, length=50)
    assert x.shape == y.shape == (51,)
    # symmetric frequencies, mirrored values, original at the center
    np.testing.assert_allclose(x, -x[::-1])
    np.testing.assert_allclose(y, y[::-1])
    np.testing.assert_allclose(y[25:], arr)


def test_fig3_sequence_cosine_notebook_semantics():
    """fig3_sequence_cosine = torchmetrics pairwise_cosine_similarity
    (diagonal zeroed) then .mean() over all N^2 entries, as in
    figure3.ipynb cell 4 — pinned against an explicit loop."""
    from bsarec_tpu.utils.visualize import fig3_sequence_cosine

    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 5))
    n = len(x)
    total = 0.0
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            a, b = x[i], x[j]
            total += a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert abs(fig3_sequence_cosine(x) - total / (n * n)) < 1e-12


def test_fig3_load_sequence_outputs_reference_layout(tmp_path):
    """load_sequence_outputs mirrors figure3.ipynb's get_seqout: per
    layer, last-position states concatenated across iterations."""
    from bsarec_tpu.utils.visualize import (
        fig3_normalized_svdvals,
        load_sequence_outputs,
    )

    rng = np.random.default_rng(1)
    dumps = {}
    for layer in range(3):
        for it in range(2):
            arr = rng.normal(size=(4, 6, 5))
            np.save(tmp_path / f"{layer}layer_{it}iter.npy", arr)
            dumps[(layer, it)] = arr
    layers = load_sequence_outputs(tmp_path, n_layers=2)
    assert len(layers) == 3 and layers[0].shape == (8, 5)
    for layer in range(3):
        want = np.concatenate(
            [dumps[(layer, it)][:, -1, :] for it in range(2)]
        )
        np.testing.assert_array_equal(layers[layer], want)
    svs = fig3_normalized_svdvals(layers[-1])
    assert svs.shape == (5,) and abs(svs[0] - 1.0) < 1e-12
    assert np.all(np.diff(svs) <= 1e-12)


def test_fig2_filter_response_notebook_squared_magnitude():
    """fig2_filter_response = `figure2.ipynb` §3 exactly: layer-0
    complex_weight [1, F, H, 2] -> (real² + imag²).mean(hidden), per
    frequency — the SQUARED magnitude, unlike filter_spectral_response's
    |w|."""
    from bsarec_tpu.utils.visualize import fig2_filter_response

    rng = np.random.default_rng(3)
    w = rng.normal(size=(1, 26, 8, 2))
    got = fig2_filter_response(w)
    want = (w[0, :, :, 0] ** 2 + w[0, :, :, 1] ** 2).mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert got.shape == (26,)


def test_fig3_load_sequence_outputs_ignores_stray_files(tmp_path):
    """Stray entries (README, markers) and extra-layer dumps are skipped;
    an absent layer raises a clear FileNotFoundError, not KeyError."""
    import pytest

    from bsarec_tpu.utils.visualize import load_sequence_outputs

    rng = np.random.default_rng(2)
    for layer in range(2):
        np.save(tmp_path / f"{layer}layer_0iter.npy", rng.normal(size=(3, 4, 5)))
    (tmp_path / ".MISSING_LARGE_BLOBS").write_text("marker")
    (tmp_path / "README.md").write_text("notes")
    np.save(tmp_path / "9layer_0iter.npy", rng.normal(size=(3, 4, 5)))  # > n_layers
    layers = load_sequence_outputs(tmp_path, n_layers=1)
    assert len(layers) == 2 and layers[0].shape == (3, 5)
    with pytest.raises(FileNotFoundError, match=r"layers \[2\]"):
        load_sequence_outputs(tmp_path, n_layers=2)
