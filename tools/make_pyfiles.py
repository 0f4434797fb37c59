"""Build the --py-files artifact for spark-submit (north rule).

    python tools/make_pyfiles.py          # -> dist/dv_engine.zip

The zip contains the engine package only (no tests/bench); ship it with

    spark-submit --py-files dist/dv_engine.zip your_job.py

so every executor can deserialize the engine's UDFs (arrays_equal_udf,
mapInPandas kernels) without a cluster-wide install.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

PKG = "dsci_524_g26_data_validation_spark"


def main() -> None:
    root = Path(__file__).resolve().parent.parent
    dist = root / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "dv_engine.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((root / PKG).rglob("*.py")):
            zf.write(py, py.relative_to(root))
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
