"""Driver script for the north rule's deployment form:

    spark-submit --master <cluster> \
        --py-files "$(python tools/make_pyfiles_zip.py)" \
        tools/submit_crawl.py --pages ... --seeds-file ... --warehouse ...

``--py-files`` puts the package zip on the driver's and every executor's
Python path, so this file only needs the import; the same invocation runs
unchanged on local[N], standalone, YARN, or k8s.
"""

import sys

from nimbus_crawler_spark.cli import main

sys.exit(main())
