"""``python -m etl_data_validation_kio_ray`` — delegates to cli.main
(the ray job submit entry point; see cli.py)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
