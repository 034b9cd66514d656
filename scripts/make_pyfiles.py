"""Build the ``--py-files`` zip for cluster submission.

``python scripts/make_pyfiles.py /tmp/lmkc.zip`` packages the
``logminer_kafka_connect_spark`` package (sources only, no caches or
tests) so a cluster run needs no repo checkout:

    spark-submit --py-files /tmp/lmkc.zip scripts/submit_job.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "logminer_kafka_connect_spark"


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmkc.zip"
    print(build(out))
