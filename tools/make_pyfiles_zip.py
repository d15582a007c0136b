"""Print the path of the content-addressed --py-files zip (building it if
needed) — the artifact half of the spark-submit deployment form; see
tools/submit_crawl.py for the driver half."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nimbus_crawler_spark.session import package_zip_path  # noqa: E402

print(package_zip_path())
