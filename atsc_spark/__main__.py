"""`python -m atsc_spark` == the reference's `atsc` binary
(`atsc/src/main.rs`); see `atsc_spark.cli`."""

import sys

from .cli import main_atsc

sys.exit(main_atsc())
