"""Build engine.zip for spark-submit --py-files (north rule launch mode).

Usage: python tools/make_pyfiles.py [out.zip]   (default: dist/engine.zip)
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "engine.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "docling_spark").rglob("*.py")):
            z.write(p, str(p.relative_to(REPO)))
    print(out)


if __name__ == "__main__":
    main()
