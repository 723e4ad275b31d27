"""Retrieval serving API driven over real HTTP (hairci/serve/api.py)."""

import base64
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from hairci.serve.api import serve


class _TinyEncoder:
    """Encoder-protocol stub: deterministic features from pixel stats."""

    img_size = 32
    batch_size = 8

    def _preprocess(self, paths):
        from hairci.data.loader import decode_image

        return np.stack([decode_image(p, "resize_center_crop", self.img_size)
                         for p in paths])

    def extract_features(self, images):
        x = images.reshape(len(images), -1, 3).astype(np.float32)
        f = np.concatenate([x.mean(1), x.std(1), x[:, ::97].reshape(
            len(images), -1)], axis=1)
        return (f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True),
                               1e-9)).astype(np.float32)

    def extract_dataset_features(self, dataset_path, output_dir):
        import os

        from hairci.retrieval.encoders import list_image_folder
        from hairci.retrieval.index import GalleryIndex

        paths = list_image_folder(dataset_path)
        feats = self.extract_features(self._preprocess(paths))
        index = GalleryIndex(feats, paths, normalized=True)
        os.makedirs(output_dir, exist_ok=True)
        index.save(output_dir)
        return index


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("apigallery")
    rng = np.random.default_rng(0)
    for i in range(12):
        a = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        Image.fromarray(a).save(d / f"{i:03d}.png")
    srv = serve(_TinyEncoder(), str(tmp_path_factory.mktemp("apiidx")),
                port=0, dataset_path=str(d))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, [str(d / f"{i:03d}.png") for i in range(12)]
    srv.shutdown()


def _req(srv, path, payload=None):
    port = srv.server_address[1]
    url = f"http://127.0.0.1:{port}{path}"
    if payload is None:
        r = urllib.request.urlopen(url, timeout=30)
    else:
        data = json.dumps(payload).encode()
        req = urllib.request.Request(
            url, data=data, headers={"Content-Type": "application/json"})
        try:
            r = urllib.request.urlopen(req, timeout=30)
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())
    return r.status, json.loads(r.read())


def test_health_and_stats(server):
    srv, _ = server
    code, h = _req(srv, "/health")
    assert code == 200 and h["status"] == "ok" and h["gallery_size"] == 12
    code, s = _req(srv, "/stats")
    assert code == 200 and "search_requests" in s


def test_search_self_retrieval(server):
    srv, paths = server
    raw = open(paths[3], "rb").read()
    code, res = _req(srv, "/search", {
        "image_b64": base64.b64encode(raw).decode(), "k": 3})
    assert code == 200
    assert res["paths"][0][0].endswith("003.png")  # self is rank-1
    assert res["scores"][0][0] == pytest.approx(1.0, abs=1e-3)


def test_embed_and_search_by_embedding(server):
    srv, paths = server
    code, e = _req(srv, "/embed", {"image_path": paths[5]})
    assert code == 200
    emb = e["embedding"][0]
    code, res = _req(srv, "/search", {"embedding": emb, "k": 2})
    assert code == 200 and res["paths"][0][0].endswith("005.png")


def test_reload_and_errors(server):
    srv, _ = server
    code, r = _req(srv, "/reload", {})
    assert code == 200 and r["gallery_size"] == 12
    code, err = _req(srv, "/search", {"image_b64": "!!!notbase64"})
    assert code == 400 and "error" in err
    code, _ = _req(srv, "/nope", {})
    assert code == 404
