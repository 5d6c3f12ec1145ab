#!/usr/bin/env python3
"""Regenerate bench_history/BENCH_BASELINE.json from fresh same-code boards.

Discipline (SCALE.md, r15): the ratchet baseline is the per-query MAX
across same-code boards — the worst observed same-code value — so a
breach means a regression beyond measured same-code variance. Rows whose
JOB STRUCTURE changed this round (named in --touched) must NOT inherit
the old baseline's slower value: their max is taken over the fresh
boards only, so a future regression back to the old shape still trips.

Usage: tools/regen_baseline.py ROUND board1.json [board2.json ...] \
          [--touched q_a,q_b] [--out bench_history/BENCH_BASELINE.json]
"""
import json, re, sys

def load_board(path):
    with open(path) as f:
        txt = f.read()
    d = json.loads(txt[txt.index('{'):txt.rindex('}') + 1])
    return {k: v for k, v in d["queries"].items() if v > 0}

def load_baseline(path):
    try:
        with open(path) as f:
            txt = f.read()
    except FileNotFoundError:
        return {}
    out = {}
    for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9][0-9.]*)', txt):
        out[m.group(1)] = float(m.group(2))
    return out

def main(argv):
    rnd = argv[1]
    boards, touched, out_path = [], set(), "bench_history/BENCH_BASELINE.json"
    i = 2
    while i < len(argv):
        a = argv[i]
        if a == "--touched":
            i += 1; touched |= set(argv[i].split(","))
        elif a == "--out":
            i += 1; out_path = argv[i]
        else:
            boards.append(load_board(a))
        i += 1
    assert boards, "need at least one board detail json"
    old = load_baseline(out_path)
    names = sorted(set().union(*[set(b) for b in boards]))
    base = {}
    for q in names:
        vals = [b[q] for b in boards if q in b]
        if q in old and q not in touched:
            vals.append(old[q])
        base[q] = round(max(vals), 3)
    src = (f"per-query MAX across {len(boards)} same-code {rnd} boards"
           + (f"; rows with changed job structure this round rebased on the"
              f" fresh boards only: {','.join(sorted(touched))}" if touched else "")
           + "; plus the prior baseline for untouched rows (worst observed"
             " same-code value — see SCALE.md ratchet-baseline discipline)")
    with open(out_path, "w") as f:
        f.write('{\n"_round": "%s",\n"_source": %s,\n' % (rnd, json.dumps(src)))
        f.write(",\n".join('"%s": %s' % (q, base[q]) for q in names))
        f.write("\n}\n")
    print(f"wrote {out_path}: {len(names)} rows "
          f"(sum {sum(base.values()):.1f} s), touched rebased: {len(touched)}")

if __name__ == "__main__":
    main(sys.argv)
