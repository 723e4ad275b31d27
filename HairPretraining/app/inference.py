"""Shim keeping the reference module path (`HairPretraining/app/inference.py`)
— the pipeline logic lives in hairci.serve.demo."""

from hairci.serve.demo import (  # noqa: F401
    DemoPipeline,
    fill_holes_display,
    launch_gradio,
    parsing_image,
)
