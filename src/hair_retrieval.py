#!/usr/bin/env python
"""Entry-point shim keeping the reference's public CLI path
(`python src/hair_retrieval.py ...`) — see hairci/cli/retrieval.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hairci.cli.retrieval import run

if __name__ == "__main__":
    run("hair")
