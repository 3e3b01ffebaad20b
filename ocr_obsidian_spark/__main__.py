"""``python -m ocr_obsidian_spark`` → CLI (reference ingest/__main__.py)."""

import sys

from .cli import main

sys.exit(main())
