"""`python -m csdr_tpu <command> ...` — csdr-compatible CLI entry."""

import sys

from csdr_tpu.cli import main

sys.exit(main())
