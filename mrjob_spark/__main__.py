"""``python -m mrjob_spark`` — the umbrella command (see cmd.py)."""
import sys

from mrjob_spark.cmd import main

sys.exit(main())
