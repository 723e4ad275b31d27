#!/bin/bash
# Visualizer launch (parity with /root/reference/Visualizer/run.sh:
# `uvicorn app.main:app --port 8000`) — the hairci visualizer needs no
# fastapi/uvicorn; pass --data_root to point at the organized data tree.
set -e
exec python -m hairci.serve.visualizer.server --data_root "${1:-data}" --port "${2:-8000}"
