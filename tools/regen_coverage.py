"""Regenerate COVERAGE.md's oracle-checked table from the registry's
survey tags (the test-verified table below it is maintained by hand).

Usage:
    python tools/regen_coverage.py            # rewrite COVERAGE.md table
    python tools/regen_coverage.py --window   # rewrite _DRIVER_WINDOW in
                                              # queries/base.py from the
                                              # union of CORRECTNESS_r*.json

``--window`` implements the rotation policy mechanically (it used to be
~190 lines of hand-maintained comments): the driver certifies only the
first 50 registry entries per round, so the window is filled with the 50
highest-priority queries that have NEVER had a driver CORRECTNESS row, in
registry order. When fewer than 50 remain unchecked, the tail back-fills
with longest-out-first (smallest last-checked round) so stale greens get
re-certified. Idempotent: names already in the current window keep their
position among the never-checked (they stay unchecked until the next
driver round runs).
"""

from __future__ import annotations

import collections
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from uk_procurement_data_pipeline_spark.queries import registry  # noqa: E402

_BEGIN = "# --- BEGIN GENERATED WINDOW (python tools/regen_coverage.py --window) ---"
_END = "# --- END GENERATED WINDOW ---"


def correctness_files() -> list[Path]:
    return sorted(REPO.glob("CORRECTNESS_r*.json"))


def compute_window(
    size: int = 50,
    files: list[Path] | None = None,
    changed: list[str] | None = None,
) -> list[str]:
    last_checked: dict[str, int] = {}
    for f in correctness_files() if files is None else files:
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        for name, row in json.loads(f.read_text()).items():
            # Red-aware (VERDICT r06 item 2): a row that errored or
            # mismatched is NOT a certification — the query must re-enter
            # the window as if never checked, else a fix waits ~3 rounds
            # behind the back-fill.
            if row.get("hash_match") is True or (
                row.get("hash_match") is None and row.get("rows_match") is True
            ):
                last_checked[name] = max(last_checked.get(name, 0), rnd)
    reg = list(registry())
    # New/changed queries this round lead the window unconditionally —
    # every behavior change gets a driver row in the round it lands.
    # Two sources (VERDICT r08 item 2): the hand-maintained _ROUND_PRIORITY
    # list, and the MECHANICAL fingerprint diff — any driver-green query
    # whose static call closure (tools/fingerprints.py) differs from the
    # code snapshot taken when it was certified re-enters automatically,
    # so a helper edit can no longer ship on a stale green row.
    from uk_procurement_data_pipeline_spark.queries import base as _base

    if changed is None:
        from tools.fingerprints import changed_queries

        changed = changed_queries(set(last_checked))
    priority = [n for n in getattr(_base, "_ROUND_PRIORITY", ()) if n in reg]
    priority += [n for n in changed if n in reg and n not in priority]
    # Changed queries lead the window UNCONDITIONALLY — when priority
    # overflows the slot budget the window GROWS past `size` instead of
    # silently trimming the tail (r12: a 51-name priority list dropped
    # `two_stage_pq_maxsim`, the one thing this rotation must never do;
    # caught by test_changed_green_queries_reenter_window).
    window = list(priority)
    if len(window) > size:
        print(
            f"window: {len(window)} priority names exceed the {size}-slot "
            "budget; keeping all (changed queries are never dropped)"
        )
    never = [n for n in reg if n not in last_checked and n not in window]
    window += never[: max(0, size - len(window))]
    if len(window) < size:
        order = {n: i for i, n in enumerate(reg)}
        stale = sorted(
            (n for n in reg if n in last_checked and n not in window),
            key=lambda n: (last_checked[n], order[n]),
        )
        window += stale[: size - len(window)]
    return window


_IN_BEGIN = "# --- BEGIN GENERATED WINDOW INPUTS ---"
_IN_END = "# --- END GENERATED WINDOW INPUTS ---"
_CH_BEGIN = "# --- BEGIN GENERATED WINDOW CHANGED ---"
_CH_END = "# --- END GENERATED WINDOW CHANGED ---"


def regen_window() -> int:
    from tools.fingerprints import changed_queries

    files = correctness_files()
    changed = changed_queries(_all_checked())
    window = compute_window(files=files, changed=changed)
    path = REPO / "uk_procurement_data_pipeline_spark" / "queries" / "base.py"
    text = path.read_text()
    start, end = text.index(_BEGIN), text.index(_END)
    body = "\n".join(f'    "{n}",' for n in window)
    text = text[:start] + f"{_BEGIN}\n{body}\n    {_END}" + text[end + len(_END):]
    # Pin the generation inputs so the guard test replays against exactly
    # these artifacts — a NEW driver CORRECTNESS file landing later must
    # not retro-fail the suite (VERDICT r06 item 3).
    istart, iend = text.index(_IN_BEGIN), text.index(_IN_END)
    ibody = "\n".join(f'    "{f.name}",' for f in files)
    text = (
        text[:istart]
        + f"{_IN_BEGIN}\n{ibody}\n    {_IN_END}"
        + text[iend + len(_IN_END):]
    )
    cstart, cend = text.index(_CH_BEGIN), text.index(_CH_END)
    cbody = "".join(f'    "{n}",\n' for n in changed)
    text = (
        text[:cstart]
        + f"{_CH_BEGIN}\n{cbody}    {_CH_END}"
        + text[cend + len(_CH_END):]
    )
    path.write_text(text)
    never_left = sum(1 for n in registry() if n not in _all_checked())
    print(f"window: {len(window)} names written; never-driver-checked remaining "
          f"in registry (incl. this window until the driver runs): {never_left}")
    return 0


def _all_checked() -> set[str]:
    out: set[str] = set()
    for f in correctness_files():
        for name, row in json.loads(f.read_text()).items():
            if row.get("hash_match") is True or (
                row.get("hash_match") is None and row.get("rows_match") is True
            ):
                out.add(name)
    return out


def main() -> int:
    # A query's FIRST survey tag is the operator it primarily demonstrates;
    # later tags are incidental coverage (VERDICT r08 item 7: the giant
    # A7/F28 rows were unauditable with both classes mixed). Incidental
    # names are listed in full only while the list stays readable; beyond
    # that the row carries the count — the full mapping is always
    # recoverable from the `survey=` tags this table is generated from.
    primary = collections.defaultdict(set)
    incidental = collections.defaultdict(set)
    for name, spec in registry().items():
        tags = spec.survey.split()
        primary[tags[0]].add(name)
        for tag in tags[1:]:
            incidental[tag].add(name)

    def key(tag: str):
        m = re.match(r"([A-Za-z]+)(\d*)", tag)
        return (m.group(1), int(m.group(2) or 0), tag)

    _INCIDENTAL_CAP = 25
    table = [
        "| SURVEY §2 row | primary queries (first `survey=` tag) "
        "| incidental coverage |",
        "|---|---|---|",
    ]
    for tag in sorted(set(primary) | set(incidental), key=key):
        prim = ", ".join(sorted(primary.get(tag, ()))) or "—"
        inc = sorted(incidental.get(tag, set()) - primary.get(tag, set()))
        if not inc:
            inc_cell = "—"
        elif len(inc) <= _INCIDENTAL_CAP:
            inc_cell = ", ".join(inc)
        else:
            inc_cell = f"{len(inc)} further queries (see `survey=` tags)"
        table.append(f"| {tag} | {prim} | {inc_cell} |")

    path = REPO / "COVERAGE.md"
    text = path.read_text()
    start = text.index("| SURVEY §2 row |")
    end = text.index("\n## Test-verified coverage")
    path.write_text(text[:start] + "\n".join(table) + "\n" + text[end:])
    print(f"regenerated: {len(table) - 2} tags over {len(registry())} queries")
    return 0


if __name__ == "__main__":
    if "--window" in sys.argv:
        raise SystemExit(regen_window())
    raise SystemExit(main())
