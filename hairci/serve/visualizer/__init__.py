"""Result-inspection web app — rebuild of `/root/reference/Visualizer/`
(SURVEY.md §2.3): browse precomputed top-100 retrieval JSONs against
ground-truth benchmarks with hit/miss coloring, for ≤2 models side by side.

FastAPI is not available in this image, so the app core (config, data
loading, hit computation, schemas) is framework-free; `server.py` serves it
with the stdlib http.server, and `fastapi_app.py` provides the same routes
(`/`, `/api/result`, `/health`, `/reload`) when fastapi is installed.
"""

from hairci.serve.visualizer.data_manager import DataManager
from hairci.serve.visualizer.retrieval_api import RetrievalAPI
