"""``python -m pysp_tpu`` — forwards to the CLI (cli.py)."""
import sys

from .cli import main

sys.exit(main())
