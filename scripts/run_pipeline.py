#!/usr/bin/env python
"""spark-submit driver script.

    python kgmwcp/cli.py package  # or: python -c "from kgmwcp.cli import package_pyfiles; print(package_pyfiles())"
    spark-submit --master spark://... --py-files dist/kgmwcp.zip \
        scripts/run_pipeline.py --input /data/documents --output /data/kg
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgmwcp.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
