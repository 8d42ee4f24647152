"""Package atsc_spark for spark-submit --py-files.

    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --master <...> --py-files atsc_spark.zip tools/submit_job.py --store <dir>
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "atsc_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, repo)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "atsc_spark.zip"
    print(build(out))
