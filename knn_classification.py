#!/usr/bin/env python
"""Entry-point shim keeping the reference's public CLI path
(`python knn_classification.py ...`) — see hairci/cli/knn_classification.py."""

from hairci.cli.knn_classification import main

if __name__ == "__main__":
    main()
