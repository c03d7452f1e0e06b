"""One-off audit of every F.round site for signed-zero hazard (PARITY
#10): classify each site by whether its operand can be a CANCELLING
SIGNED SUM whose tiny residual could land on opposite sides of zero on
the two engines (the only way round() emits -0.0 on one side and +0.0
on the other).

Categories:
  GUARDED  — already normalized with `+ F.lit(0.0)` on the same site
  INT      — integerized (`F.round(x)...cast("long")` or *100 cents):
             integers have no signed zero
  DECIMAL  — rounds an exact DECIMAL (``_money``/explicit cast): both
             engines see the identical exact value, so the sign of a
             zero is identical too
  NONNEG   — operand is nonnegative by construction (counts, abs,
             ranks in [0,1], percentiles of positive columns, norms,
             powers of 2): -0.0 unreachable
  SIGNED   — operand is a double that CAN go negative: the residual
             class; each needs a guard or a written immunity argument

Usage: python tools/audit_signed_zero.py [--signed-only]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

OPS = Path(__file__).resolve().parent.parent / "cassandra_extractor_spark"

FILES = sorted(OPS.glob("operators/*.py")) + [
    OPS / "streaming" / "stateful.py",
    OPS / "functions" / "tablespecs.py",
]


def extract_sites(text: str):
    """Yield (line_no, balanced F.round(...) call + ~60 chars after)."""
    for m in re.finditer(r"F\.round\(", text):
        depth, i = 1, m.end()
        while i < len(text) and depth:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        yield text[: m.start()].count("\n") + 1, re.sub(
            r"\s+", " ", text[m.start() : i + 60]
        )


NONNEG_PAT = re.compile(
    r"percent_rank|cume_dist|percentile|F\.abs\(|F\.count|F\.length|"
    r"pow\(F\.lit\(2\.0\)|sqrt|F\.exp\(|norm\(|freq|F\.size|idf|"
    r"\* F\.col\(\"tf\"\)|datediff|dcg"
)


def classify(site: str) -> str:
    if "+ F.lit(0.0)" in site:
        return "GUARDED"
    after = site.split("F.round(", 1)[1]
    if re.search(r"^\)*\s*\.cast\(\"long\"\)", after[after.rfind(")") :]):
        return "INT"
    if re.search(r"\)\.cast\(\"long\"\)", site) and ", " not in after.split(")")[0]:
        return "INT"
    if re.search(r"\* 100\)\.cast\(\"long\"\)|\)\)\.cast\(\"long\"\)", site):
        return "INT"
    if "_money(" in site or "decimal" in site:
        return "DECIMAL"
    if NONNEG_PAT.search(site):
        return "NONNEG"
    return "SIGNED"


def main() -> None:
    signed_only = "--signed-only" in sys.argv[1:]
    counts: dict[str, int] = {}
    for f in FILES:
        rel = f.relative_to(OPS.parent)
        for line_no, site in extract_sites(f.read_text()):
            cat = classify(site)
            counts[cat] = counts.get(cat, 0) + 1
            if not signed_only or cat == "SIGNED":
                print(f"{cat:8} {rel}:{line_no}  {site[:140]}")
    print("---", dict(sorted(counts.items())))


if __name__ == "__main__":
    main()
