"""``python -m realparse_spark`` — see cli.py for the subcommand surface."""

import sys

from realparse_spark.cli import main

sys.exit(main())
