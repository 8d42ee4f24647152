"""`python -m atsc_spark.wav2wbro` == the reference's `wav2wbro`
migration binary (`tools/src/bin/wav2wbro.rs`); see `atsc_spark.cli`."""

import sys

from .cli import main_wav2wbro

if __name__ == "__main__":
    sys.exit(main_wav2wbro())
