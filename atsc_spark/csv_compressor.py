"""`python -m atsc_spark.csv_compressor` == the reference's
`csv-compressor` binary (`csv-compressor/src/main.rs`); see
`atsc_spark.cli`."""

import sys

from .cli import main_csv_compressor

if __name__ == "__main__":
    sys.exit(main_csv_compressor())
