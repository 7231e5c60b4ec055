"""Package pyxml_spark into dist/pyxml_spark.zip for spark-submit --py-files.

Usage:
    python3 scripts/make_dist.py
    spark-submit --py-files dist/pyxml_spark.zip pyxml_spark/jobs/extract.py ...
"""
from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str = None) -> str:
    out_path = out_path or os.path.join(REPO, 'dist', 'pyxml_spark.zip')
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, 'pyxml_spark')
    with zipfile.ZipFile(out_path, 'w', zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if '__pycache__' in root:
                continue
            for name in sorted(files):
                # package data files (e.g. the committed BPE merge table)
                # alongside the code: executors import from the zip, so a
                # .py-only zip would crash any kernel that reads them
                if not name.endswith(('.py', '.json')):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == '__main__':
    print(build())
