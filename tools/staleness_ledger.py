#!/usr/bin/env python3
"""Hash-age ledger for the driver verification windows.

The driver hashes the FIRST 50 ``queries()`` entries each round
(``CORRECTNESS_r{N}.json`` holds exactly those keys), so every query's
"freshness" is the latest round whose correctness file contains it — plus
any window that is hoisted in ``__spark_entry__.py`` but whose driver run
has not happened yet.  Planning each round's rotation means retiring the
oldest cohorts first; this tool computes that map mechanically so the
rotation plan (and the verdict's staleness accounting) can be checked
instead of hand-derived.

Stdlib-only (no Spark import): window lists are parsed from the entry
module's SOURCE, so the tool runs in milliseconds anywhere.

Usage:
    python tools/staleness_ledger.py                  # distribution + cohorts
    python tools/staleness_ledger.py --pending _R9_WINDOW
        # treat that window as already hashed (the upcoming driver run)
        # before printing — i.e. the post-round map
    python tools/staleness_ledger.py --check _R10_WINDOW --pending _R9_WINDOW
        # verify a planned window: names must exist, be distinct, be 50,
        # and must cover the oldest post-round cohort completely
    python tools/staleness_ledger.py --check _R10_WINDOW
        # same, defaulting --pending to the window hoisted in queries()
        # (the active round) so both spellings apply the identical
        # accounting — bare --check used to assume the hoisted window had
        # already landed and could contradict the --pending invocation
        # whenever its CORRECTNESS file had not been committed yet
        # (VERDICT r11 "what's wrong")
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def correctness_rounds() -> list[tuple[int, dict]]:
    out = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as fh:
            out.append((int(m.group(1)), json.load(fh)))
    return sorted(out)


def entry_windows() -> dict[str, list[str]]:
    """Parse every _R{N}_WINDOW list literal from the entry source."""
    with open(os.path.join(REPO, "__spark_entry__.py")) as fh:
        src = fh.read()
    windows: dict[str, list[str]] = {}
    for m in re.finditer(r"^(_R\d+_WINDOW) = \[(.*?)^\]", src, re.S | re.M):
        windows[m.group(1)] = re.findall(r'"([a-z0-9_]+)"', m.group(2))
    return windows


def hoisted_window() -> str | None:
    """The window name ``queries()`` hoists to the front — i.e. the ACTIVE
    round's verification window, whose driver run is either pending or the
    latest landed file.  Parsed from the entry source's hoist line
    (``out = {name: base[name] for name in _RN_WINDOW}``)."""
    with open(os.path.join(REPO, "__spark_entry__.py")) as fh:
        src = fh.read()
    m = re.search(r"for name in (_R\d+_WINDOW)\b", src)
    return m.group(1) if m else None


def build_map(pending: list[str] | None) -> tuple[dict[str, int], dict[str, int]]:
    """(last_round, first_seen_order) per query; `pending` rows get round
    max+1 (the driver run that has not happened yet).  If the pending
    window's own driver run has already landed — some recorded round's
    CORRECTNESS file records exactly this window, keys and order — bumping
    would misstate the distribution's round numbers, so the bump is
    skipped (ADVICE r9).  The landed-ness test is the exact key-list
    match, not "all rows carry the global max round" (ADVICE r10): the
    global-max comparison made --pending on an older landed window bump
    its rows to a phantom round the moment any newer round's file landed,
    and a per-row round test would re-arm the same bug once a later
    rotation re-hashes part of an old window."""
    recorded = correctness_rounds()
    last: dict[str, int] = {}
    order: dict[str, int] = {}
    top = 0
    for rnd, rows in recorded:
        top = max(top, rnd)
        for i, name in enumerate(rows):
            last[name] = rnd
            order[name] = i
    if pending:
        landed = any(list(rows) == list(pending) for _rnd, rows in recorded)
        if not landed:
            for i, name in enumerate(pending):
                last[name] = top + 1
                order[name] = i
    return last, order


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pending", help="window name treated as already hashed")
    ap.add_argument("--check", help="window name to verify as the next rotation")
    args = ap.parse_args()

    windows = entry_windows()
    if args.check and not args.pending:
        # bare --check must apply the same accounting as the documented
        # --pending invocation: the hoisted window is the active round,
        # landed or not (build_map's landed test makes this a no-op once
        # its CORRECTNESS file exists), so the two spellings can never
        # print contradictory verdicts about the same planned window
        args.pending = hoisted_window()
        if args.pending and args.pending in windows:
            # only announce the default when it changes the accounting:
            # once the hoisted window's own CORRECTNESS file has landed,
            # build_map skips the bump and the default is a no-op
            # (VERDICT r12 cosmetic nit)
            landed = any(
                list(rows) == list(windows[args.pending])
                for _rnd, rows in correctness_rounds()
            )
            if not landed:
                print(f"(--pending defaulted to hoisted {args.pending})")
    for flag in ("pending", "check"):
        name = getattr(args, flag)
        if name and name not in windows:
            print(f"no {name} in __spark_entry__.py (have: {sorted(windows)})")
            return 2

    last, order = build_map(windows[args.pending] if args.pending else None)
    if not last:
        print("no CORRECTNESS_r*.json files found — nothing to ledger")
        return 2
    by_round: dict[int, list[str]] = {}
    for name, rnd in last.items():
        by_round.setdefault(rnd, []).append(name)

    print(f"{len(last)} driver rows; hash-age distribution:")
    for rnd in sorted(by_round):
        print(f"  r{rnd}: {len(by_round[rnd])}")
    oldest = min(by_round)
    for rnd in sorted(by_round)[:2]:
        rows = sorted(by_round[rnd], key=lambda n: order[n])
        print(f"cohort r{rnd} ({len(rows)}, in last-window order):")
        for name in rows:
            print(f"  {name}")

    if args.check:
        win = windows[args.check]
        errs = []
        if len(win) != 50:
            errs.append(f"{len(win)} names, want 50")
        if len(set(win)) != len(win):
            errs.append("duplicate names")
        unknown = [n for n in win if n not in last]
        if unknown:
            errs.append(f"names never driver-hashed (typo?): {unknown}")
        missed = [n for n in by_round[oldest] if n not in win]
        if len(by_round[oldest]) <= 50 and missed:
            errs.append(f"oldest cohort r{oldest} not fully covered: {missed}")
        if errs:
            print(f"{args.check}: FAIL")
            for e in errs:
                print(f"  - {e}")
            return 1
        cov = {r: sum(1 for n in win if last[n] == r) for r in sorted(by_round)}
        print(f"{args.check}: OK — covers " + ", ".join(
            f"r{r}x{c}" for r, c in cov.items() if c))
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:
        # downstream pager closed the pipe (e.g. `| head`) — not an error
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        sys.exit(0)
