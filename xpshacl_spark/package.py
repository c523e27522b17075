"""Build the --py-files archive for cluster launches.

`python -m xpshacl_spark.package [out.zip]` zips the xpshacl_spark
package (sources only, no __pycache__/bytecode) into the archive that
`spark-submit --py-files xpshacl_spark.zip xpshacl_spark/runner.py ...`
ships to executors. Kept dependency-free and deterministic: entries are
added in sorted path order with a fixed timestamp, so rebuilding an
unchanged tree yields a byte-identical archive (reproducible deploys;
an artifact store can dedup on content hash).
"""

from __future__ import annotations

import os
import sys
import zipfile

# fixed DOS timestamp (2020-01-01 00:00:00) for reproducible archives
_FIXED_DATE = (2020, 1, 1, 0, 0, 0)


def build_pyfiles_zip(out_path: str = "xpshacl_spark.zip") -> str:
    """Zip the installed xpshacl_spark package into ``out_path`` and
    return the absolute path. Source files only — executors compile
    their own bytecode."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_root)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            entries.append((os.path.relpath(full, parent), full))
    out_path = os.path.abspath(out_path)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname.replace(os.sep, "/"), _FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else "xpshacl_spark.zip"
    print(build_pyfiles_zip(target))
