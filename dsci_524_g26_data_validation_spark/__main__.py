"""``python -m dsci_524_g26_data_validation_spark`` → CLI."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
