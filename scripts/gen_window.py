"""Regenerate registry.CORE_ORDER from the mechanized window policy.

Usage: python scripts/gen_window.py        (rewrites registry.py in place)
       python scripts/gen_window.py --check (exit 1 if registry is stale)

CORE_ORDER is the driver-facing window as a LITERAL list so the runtime
never parses JSON history; this script is the only writer. The derivation
lives in graph_etl_pipeline_spark/window_policy.py and is unit-tested to
reproduce prior rounds' windows (tests/test_window_policy.py).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from graph_etl_pipeline_spark import window_policy  # noqa: E402
from graph_etl_pipeline_spark.registry import registration_order  # noqa: E402

BEGIN = "# --- GENERATED WINDOW (scripts/gen_window.py) — do not hand-edit ---"
END = "# --- END GENERATED WINDOW ---"


def render() -> str:
    through = window_policy.latest_round(REPO)
    window = window_policy.derive_window(
        registration_order(),
        window_policy.load_history(REPO, through_round=through),
        changed=window_policy.CHANGED_SINCE_GREEN,
    )
    lines = [
        BEGIN,
        "# History rounds this window was derived from; the pin test replays",
        "# the derivation over exactly these rounds, so the driver landing",
        "# CORRECTNESS_r{N+1}.json mid-round cannot invalidate the literal.",
        f"CORE_ORDER_THROUGH_ROUND = {through}",
        "CORE_ORDER = [",
    ]
    lines += [f'    "{n}",' for n in window]
    lines += ["]", END]
    return "\n".join(lines)


def main() -> int:
    path = os.path.join(REPO, "graph_etl_pipeline_spark", "registry.py")
    with open(path) as f:
        src = f.read()
    block = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL)
    if not block.search(src):
        print("generated-window markers not found in registry.py", file=sys.stderr)
        return 2
    new = block.sub(render().replace("\\", "\\\\"), src)
    if "--check" in sys.argv:
        if new != src:
            print("registry.CORE_ORDER is stale — run scripts/gen_window.py")
            return 1
        print("registry.CORE_ORDER is current")
        return 0
    if new != src:
        with open(path, "w") as f:
            f.write(new)
        print("registry.CORE_ORDER regenerated")
    else:
        print("registry.CORE_ORDER already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
