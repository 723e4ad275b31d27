#!/usr/bin/env python
"""Entry-point shim keeping the reference's public CLI path
(`python mainpretrain.py ...`) — see hairci/cli/mainpretrain.py."""

from hairci.cli.mainpretrain import main

if __name__ == "__main__":
    main()
