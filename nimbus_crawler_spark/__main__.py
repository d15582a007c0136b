"""``python -m nimbus_crawler_spark`` — same driver as tools/submit_crawl.py."""

import sys

from nimbus_crawler_spark.cli import main

sys.exit(main())
