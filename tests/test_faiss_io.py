"""FAISS flat-index file compatibility (hairci/retrieval/faiss_io.py).

The reference persists `faiss.write_index(IndexFlatL2)` + pickled paths
(`/root/reference/HairPretraining/app/inference.py:96-98`); these tests lock
our reader/writer to that binary layout with hand-built golden bytes (faiss
itself is absent in this environment by design).
"""

import os
import pickle
import struct

import numpy as np
import pytest

from hairci.retrieval.faiss_io import (
    METRIC_INNER_PRODUCT,
    METRIC_L2,
    load_faiss_flat,
    read_flat_index,
    save_faiss_flat,
    write_flat_index,
)
from hairci.retrieval.index import GalleryIndex


def _golden_bytes(vecs: np.ndarray, metric=METRIC_L2,
                  count_in_bytes=False) -> bytes:
    """Independently assemble the FAISS IndexFlat layout byte-by-byte."""
    n, d = vecs.shape
    out = {METRIC_L2: b"IxF2", METRIC_INNER_PRODUCT: b"IxFI"}[metric]
    out += struct.pack("<i", d)
    out += struct.pack("<q", n)
    out += struct.pack("<q", 1 << 20) * 2
    out += struct.pack("<?", True)
    out += struct.pack("<i", metric)
    out += struct.pack("<Q", n * d * 4 if count_in_bytes else n * d)
    out += vecs.astype("<f4").tobytes()
    return out


def test_writer_matches_golden_layout(tmp_path):
    vecs = np.arange(6, dtype=np.float32).reshape(2, 3)
    path = str(tmp_path / "i.index")
    write_flat_index(vecs, path)
    assert open(path, "rb").read() == _golden_bytes(vecs)


def test_roundtrip_both_metrics(tmp_path):
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(17, 5)).astype(np.float32)
    for metric in (METRIC_L2, METRIC_INNER_PRODUCT):
        path = str(tmp_path / f"m{metric}.index")
        write_flat_index(vecs, path, metric)
        got, got_metric = read_flat_index(path)
        np.testing.assert_array_equal(got, vecs)
        assert got_metric == metric


def test_reader_accepts_byte_count_encoding(tmp_path):
    """Defensive leniency: a byte-count (n*d*4) payload header still loads.
    No faiss version writes this (faiss emits codes.size()/4, the float
    count, for back-compat) — this guards the reader's tolerance only."""
    vecs = np.random.default_rng(1).normal(size=(3, 4)).astype(np.float32)
    path = str(tmp_path / "codes.index")
    with open(path, "wb") as f:
        f.write(_golden_bytes(vecs, count_in_bytes=True))
    got, metric = read_flat_index(path)
    np.testing.assert_array_equal(got, vecs)
    assert metric == METRIC_L2


def test_reader_rejects_non_flat_and_truncated(tmp_path):
    bad = tmp_path / "bad.index"
    bad.write_bytes(b"IwXX" + b"\0" * 40)
    with pytest.raises(ValueError, match="not a FAISS flat index"):
        read_flat_index(str(bad))
    vecs = np.ones((4, 4), dtype=np.float32)
    trunc = tmp_path / "trunc.index"
    trunc.write_bytes(_golden_bytes(vecs)[:-8])
    with pytest.raises(ValueError, match="payload mismatch"):
        read_flat_index(str(trunc))


def test_reference_artifact_pair_loads_and_ranks(tmp_path):
    """index_hair_region.index + paths_hair_region.pkl (the reference demo's
    artifact names) load into a GalleryIndex with identical ranking."""
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(32, 8)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)  # ref normalizes
    paths = [f"img_{i:03d}_hair.png" for i in range(32)]
    idx_path = str(tmp_path / "index_hair_region.index")
    write_flat_index(feats, idx_path)
    with open(tmp_path / "paths_hair_region.pkl", "wb") as f:
        pickle.dump(paths, f)

    index = load_faiss_flat(idx_path)  # paths pkl discovered by naming
    assert index.paths == paths
    q = feats[5] + 0.01 * rng.normal(size=8).astype(np.float32)
    scores, ids = index.search(q, k=5)
    expect = np.argsort(
        -(feats @ (q / np.linalg.norm(q))))[:5]
    np.testing.assert_array_equal(np.asarray(ids)[0], expect)
    assert ids[0][0] == 5


def test_gallery_export_reimport(tmp_path):
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(10, 6)).astype(np.float32)
    index = GalleryIndex(feats, [f"p{i}" for i in range(10)])
    ip, pp = str(tmp_path / "x.index"), str(tmp_path / "x.pkl")
    save_faiss_flat(index, ip, pp)
    back = load_faiss_flat(ip, pp)
    assert back.paths == index.paths
    np.testing.assert_allclose(
        np.asarray(back.embeddings[:len(back)]),
        np.asarray(index.embeddings[:len(index)]), atol=1e-6)


def test_unnormalized_rows_refused(tmp_path):
    """GalleryIndex is cosine-ranked; an unnormalized faiss gallery would
    silently rank differently than faiss did, so the import refuses."""
    vecs = np.random.default_rng(5).normal(size=(6, 4)).astype(np.float32) * 3
    ip = str(tmp_path / "raw.index")
    write_flat_index(vecs, ip, METRIC_INNER_PRODUCT)
    with pytest.raises(ValueError, match="not L2-normalized"):
        load_faiss_flat(ip)


def test_path_count_mismatch_raises(tmp_path):
    vecs = np.ones((4, 4), dtype=np.float32) / 2.0  # unit rows
    ip = str(tmp_path / "y.index")
    write_flat_index(vecs, ip)
    pp = str(tmp_path / "y.pkl")
    with open(pp, "wb") as f:
        pickle.dump(["only", "two"], f)
    with pytest.raises(ValueError, match="2 paths for 4 vectors"):
        load_faiss_flat(ip, pp)


def test_retrieval_cli_imports_faiss_index(tmp_path, capsys):
    """`hair_retrieval.py --faiss_index` serves straight from a
    reference-built index file (migration path, no re-extraction)."""
    from PIL import Image

    from hairci.cli.retrieval import run

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(6)
    paths = []
    for i in range(6):
        p = str(img_dir / f"{i:03d}_hair.png")
        Image.fromarray(rng.integers(0, 255, (40, 40, 3),
                                     dtype=np.uint8)).save(p)
        paths.append(p)
    feats = rng.normal(size=(6, 768)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    idx_path = str(tmp_path / "index_hair_region.index")
    write_flat_index(feats, idx_path)
    with open(tmp_path / "paths_hair_region.pkl", "wb") as f:
        pickle.dump(paths, f)

    run("hair",
        ["--data_path", str(img_dir), "--faiss_index", idx_path,
         "--query_image", paths[1], "--top_k", "3", "--batch_size", "2"])
    out = capsys.readouterr().out
    assert "Query: " in out and "similarity" in out
    assert out.count(". /") == 3 or out.count("1. ") >= 1
