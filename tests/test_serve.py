import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from hairci.serve.visualizer.data_manager import DataManager
from hairci.serve.visualizer.image_utils import ResultProcessor, to_gt_name
from hairci.serve.visualizer.retrieval_api import RetrievalAPI


@pytest.fixture(scope="module")
def viz_data(tmp_path_factory):
    """Dataset tree with benchmark + two model result files + images."""
    root = tmp_path_factory.mktemp("vizdata")
    ds = root / "hairstyle"
    (ds / "results").mkdir(parents=True)
    (ds / "hair").mkdir()
    (ds / "face").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(ds / "hair" / f"q{i}_hair.png")
    bench = [{"query_image": f"q{i}.jpg", "ground_truth": [f"q{i}.jpg"]}
             for i in range(4)]
    (ds / "benchmark.json").write_text(json.dumps(bench))
    for model, hits in (("modelA", True), ("modelB", False)):
        results = []
        for i in range(4):
            top = ([f"q{i}_hair.png"] if hits else []) + \
                [f"q{(i+j) % 4}_hair.png" for j in range(1, 4)]
            results.append({"query": f"q{i}.jpg", "top100": top})
        (ds / "results" / f"{model}_top100_results.json").write_text(
            json.dumps(results))
    datasets = {
        "hairstyle": {
            "name": "test",
            "benchmark": str(ds / "benchmark.json"),
            "results_dir": str(ds / "results"),
            "mounts": {"hair": str(ds / "hair"), "face": str(ds / "face")},
        }
    }
    return datasets


def test_hits_and_misses():
    rows, hits, misses = ResultProcessor.compute_hits_and_misses(
        ["a_hair.png", "b_hair.png"], ["a.jpg"])
    assert hits == 1 and misses == 1
    assert rows[0]["hit"] and not rows[1]["hit"]
    assert to_gt_name("x_hair.png") == "x.jpg"


def test_data_manager_and_api(viz_data):
    manager = DataManager(viz_data)
    assert manager.benchmarks() == ["hairstyle"]
    assert manager.models("hairstyle") == ["modelA", "modelB"]
    assert len(manager.queries("hairstyle")) == 4
    api = RetrievalAPI(manager)
    health = api.health()
    assert health.benchmarks == 1 and health.models == 2
    result = api.get_query_result("hairstyle", "q0.jpg")
    assert len(result.models) == 2
    a = next(m for m in result.models if m.model == "modelA")
    b = next(m for m in result.models if m.model == "modelB")
    assert a.hits == 1 and a.results[0].hit
    assert b.hits == 0


def test_stdlib_server_routes(viz_data):
    from hairci.serve.visualizer.server import serve_stdlib

    server = serve_stdlib(datasets=viz_data, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}") as r:
                return r.status, r.read()

        status, body = get("/health")
        assert status == 200 and json.loads(body)["status"] == "ok"
        status, body = get("/api/benchmarks")
        assert json.loads(body) == ["hairstyle"]
        status, body = get("/api/models?dataset=hairstyle")
        assert json.loads(body) == ["modelA", "modelB"]
        status, body = get("/api/result?dataset=hairstyle&query=q0.jpg")
        data = json.loads(body)
        assert data["query"] == "q0.jpg" and len(data["models"]) == 2
        status, body = get("/?dataset=hairstyle&query=q0.jpg")
        assert status == 200 and b"hits" in body
        status, body = get("/images/hairstyle/q0_hair.png")
        assert status == 200 and len(body) > 0
        status, body = get("/reload")
        assert json.loads(body)["status"] == "reloaded"
    finally:
        server.shutdown()


def test_demo_pipeline(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from hairci.serve.demo import DemoPipeline, fill_holes_display, parsing_image

    rng = np.random.default_rng(0)
    gallery_dir = tmp_path / "gallery"
    gallery_dir.mkdir()
    for i in range(4):
        arr = np.zeros((64, 64, 3), dtype=np.uint8)
        arr[16:48, 16:48] = rng.integers(60, 255, (32, 32, 3))
        Image.fromarray(arr).save(gallery_dir / f"g{i}_hair.png")

    # segmentation fallback produces plausible masks
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    img[10:50, 10:50] = 200
    hair, display = parsing_image(img)
    assert hair.shape == img.shape
    assert (hair[0, 0] == 0).all() and (display[0, 0] == 255).all()
    assert fill_holes_display(hair).shape == img.shape

    from hairci.retrieval.encoders import HairEncoder

    class TinyEncoder(HairEncoder):
        def __init__(self):
            from hairci.models.vit import build_vit
            import jax.numpy as jnp

            self.model = build_vit("vit_tiny_patch16", img_size=224,
                                   dtype=jnp.float32)
            super(HairEncoder, self).__init__(None, batch_size=4)

    enc = TinyEncoder()
    pipe = DemoPipeline(enc, str(tmp_path / "index"))
    pipe.build_index(str(gallery_dir))
    images, scores, paths = pipe.retrieve(img, k=3)
    assert len(images) == 3 and len(scores) == 3
    assert all(0 <= s <= 1.001 for s in scores)
