"""End-to-end SIFT1B-flow test: mini synthetic bvecs driving the EXACT code
path of examples/run_sift1b.py (stream-ingest -> reconfigure -> save_index ->
cached reload -> L = w*L0 sweep with recall), the composition the reference
exercises at /root/reference/examples/benchmark/run_sift1b.py:72-107."""

import os
import runpy
import sys

import numpy as np
import pytest


def _write_bvecs(path, x):
    """(N, D) uint8 -> .bvecs (int32 d + d uint8 payload per record)."""
    n, d = x.shape
    rec = np.empty((n, 4 + d), np.uint8)
    rec[:, :4] = np.frombuffer(
        np.full(n, d, np.int32).tobytes(), np.uint8).reshape(n, 4)
    rec[:, 4:] = x
    rec.tofile(path)


def _write_ivecs(path, x):
    n, d = x.shape
    rec = np.empty((n, d + 1), np.int32)
    rec[:, 0] = d
    rec[:, 1:] = x
    rec.tofile(path)


@pytest.fixture(scope="module")
def sift1b_mini(tmp_path_factory):
    """Mini bigann layout: clustered uint8 base/learn/query + exact gt."""
    root = tmp_path_factory.mktemp("bigann")
    rng = np.random.RandomState(42)
    n, d, n_clusters = 20000, 16, 50
    centers = rng.randint(30, 225, (n_clusters, d))
    assign = rng.randint(0, n_clusters, n)
    base = np.clip(centers[assign]
                   + rng.normal(0, 12, (n, d)), 0, 255).astype(np.uint8)
    learn = np.clip(centers[rng.randint(0, n_clusters, 4000)]
                    + rng.normal(0, 12, (4000, d)), 0, 255).astype(np.uint8)
    qn = 64
    qidx = rng.choice(n, qn, replace=False)
    queries = base[qidx]
    # exact f32 ground truth (top-100, texmex layout)
    d2 = ((queries.astype(np.float32)[:, None, :]
           - base.astype(np.float32)[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :100].astype(np.int32)

    _write_bvecs(root / "bigann_base.bvecs", base)
    _write_bvecs(root / "bigann_learn.bvecs", learn)
    _write_bvecs(root / "bigann_query.bvecs", queries)
    os.makedirs(root / "gnd", exist_ok=True)
    _write_ivecs(root / "gnd" / f"idx_{n // 10**6}M.ivecs", gt)
    return root, n, gt


def _run_sift1b(root, n, cache, capsys):
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "run_sift1b.py")
    argv = sys.argv
    sys.argv = ["run_sift1b.py", "--data", str(root), "--n", str(n),
                "--nt", "4000", "--batch", "6000", "--M", "8",
                "--cache", str(cache)]
    try:
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = argv
    return capsys.readouterr().out


def test_sift1b_flow_end_to_end(sift1b_mini, tmp_path, capsys):
    root, n, gt = sift1b_mini
    cache = tmp_path / "cache"
    out = _run_sift1b(root, n, cache, capsys)

    # streamed ingestion in --batch chunks, then one reconfigure
    assert out.count("ingested") == 4  # 20000 / 6000 -> 4 batches
    assert f"N={n}" in out
    # the L = w * L0 sweep printed recall for each w
    recalls = [float(line.rsplit("Recall@1=", 1)[1])
               for line in out.splitlines() if "Recall@1=" in line]
    assert len(recalls) == 4
    # recall must be sane and (weakly) improve with a wider budget
    assert recalls[-1] >= recalls[0] - 1e-9
    assert recalls[-1] > 0.5, recalls
    # engine checkpoint was written
    assert os.path.exists(os.path.join(
        cache, f"engine_M8_N{n}", "manifest.json"))


def test_sift1b_flow_cached_reload(sift1b_mini, tmp_path, capsys):
    """Second invocation must take the load_index path and reproduce the
    sweep (the reference's pickle-cache flow, run_sift1b.py:72-99)."""
    root, n, gt = sift1b_mini
    cache = tmp_path / "cache"
    out1 = _run_sift1b(root, n, cache, capsys)
    out2 = _run_sift1b(root, n, cache, capsys)
    assert "loading cached engine" not in out1
    assert "loading cached engine" in out2
    r1 = [l.rsplit("Recall@1=", 1)[1] for l in out1.splitlines()
          if "Recall@1=" in l]
    r2 = [l.rsplit("Recall@1=", 1)[1] for l in out2.splitlines()
          if "Recall@1=" in l]
    assert r1 == r2  # deterministic: same index, same sweep
