"""Dev harness: run the HTML extraction core over the reference fixture corpus
and diff md/itxt against goldens. Usage: python tools/golden_check.py [name ...]
"""

import difflib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from docling_spark.htmlx.extract import extract_html
from docling_spark.serialize import to_itxt, to_markdown

DATA = Path("/root/reference/tests/data")
GT = DATA / "groundtruth" / "docling_v2"


def check(path: Path, show_diff: bool = False) -> tuple[bool, bool]:
    raw = path.read_bytes()
    doc = extract_html(raw, base_uri="None", name=path.stem)
    ok = []
    for kind, render in (("md", to_markdown), ("itxt", lambda d: to_itxt(d, 70))):
        gt_file = GT / f"{path.name}.{kind}"
        if not gt_file.exists():
            ok.append(True)
            continue
        gt = gt_file.read_text(encoding="utf-8")
        pred = render(doc)
        good = pred == gt
        ok.append(good)
        if not good and show_diff:
            print(f"--- {path.name}.{kind} DIFF (gt vs pred) ---")
            for line in list(
                difflib.unified_diff(gt.splitlines(), pred.splitlines(), lineterm="")
            )[:80]:
                print(line)
    return ok[0], ok[1]


def main():
    names = sys.argv[1:]
    files = sorted((DATA / "html").glob("*.html"))
    if names:
        files = [f for f in files if any(n in f.name for n in names)]
    n_md = n_itxt = 0
    for f in files:
        try:
            md_ok, itxt_ok = check(f, show_diff=bool(names))
        except Exception as e:
            print(f"{f.name:36s} EXC: {type(e).__name__}: {e}")
            continue
        n_md += md_ok
        n_itxt += itxt_ok
        print(f"{f.name:36s} md={'OK ' if md_ok else 'FAIL'} itxt={'OK ' if itxt_ok else 'FAIL'}")
    print(f"\n{n_md}/{len(files)} md, {n_itxt}/{len(files)} itxt")


if __name__ == "__main__":
    main()
