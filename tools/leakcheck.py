#!/usr/bin/env python3
"""Leak scan for the graft repo: greps src/ (and the repo-root docs/mains)
for anything that looks like a non-public dependency — internal package
imports, private hosts/buckets, chat links, credentials, or unexpected
environment variables. Emits LEAKCHECK.json with provenance (scan time,
commit) so each round's artifact is distinguishable and reproducible.

Usage: python3 tools/leakcheck.py <round-number>
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# categories -> regex. Kept deliberately broad; every hit is a (file, line,
# match) triple for human adjudication, not an auto-fail.
PATTERNS = {
    # package imports outside the sanctioned namespaces. Rooted at a TLD-ish
    # package segment so Scala VALUE imports (spark.implicits._,
    # s.implicits._) don't false-positive — those begin with a local
    # lowercase identifier that is not a reverse-domain root.
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.spark|org\.apache\.hadoop|org\.scalatest"
        r"|org\.scalacheck|scala\.|java\.|javax\.|graft\.)"
        r"(?P<m>(?:com|org|net|io|dev|ai|co|edu|gov)\.[\w.]+)"),
    # URLs that are not public-web references (apache/github/arxiv docs,
    # plus the social-media + example domains the reference's test fixtures
    # use as DATA values)
    "internal-url": re.compile(
        r"(?P<m>https?://(?!(?i:(?:www\.)?(?:github\.com|spark\.apache\.org|"
        r"kafka\.apache\.org|arxiv\.org|duckdb\.org|issues\.apache\.org|"
        r"docs\.oracle\.com|en\.wikipedia\.org|datatracker\.ietf\.org|"
        r"twitter\.com|x\.com|example\.(?:com|org|net)|"
        r"localhost|127\.0\.0\.1)))[\w.-]+[\w/.-]*)"),
    # private object-store coordinates
    "internal-bucket": re.compile(r"(?P<m>\b(?:s3|s3a|gs|abfss?)://[\w.-]+)"),
    # chat / tracker shortlinks
    "slack-link": re.compile(r"(?P<m>\b(?:slack\.com/|go/[a-z][\w-]{2,}|#[a-z][\w-]*-(?:eng|team|feedback)\b))"),
    # credential shapes
    "api-key": re.compile(r"(?P<m>\b(?:sk-[A-Za-z0-9]{16,}|AKIA[A-Z0-9]{16}|xox[baprs]-[A-Za-z0-9-]{10,}))"),
    # env vars outside the documented SPARK_GRAFT_* / SPARK_* surface
    "unexpected-env": re.compile(
        r"sys\.env(?:\.getOrElse|\.get)?\s*\(\s*\"(?!SPARK_GRAFT_|SPARK_|JAVA_|PATH|USER|HOME|TZ)(?P<m>[A-Z][A-Z0-9_]*)\""),
}

SCAN_GLOBS = ["src/**/*.scala", "*.md", "build.sbt", "tools/*.py"]
SELF = Path(__file__).resolve()


def files():
    for g in SCAN_GLOBS:
        for p in sorted(ROOT.glob(g)):
            # the scanner's own pattern table would self-hit
            if p.resolve() == SELF or p.name in ("LEAKCHECK.json",):
                continue
            yield p


def git(*args):
    return subprocess.run(["git", *args], cwd=ROOT, capture_output=True,
                          text=True).stdout.strip()


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    for p in files():
        n_files += 1
        rel = str(p.relative_to(ROOT))
        for i, line in enumerate(p.read_text(errors="replace").splitlines(), 1):
            for cat, rx in PATTERNS.items():
                m = rx.search(line)
                if m:
                    hits[cat].append({"file": rel, "line": i, "match": m.group("m")})
    out = {
        "round": rnd,
        "scanned_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": git("rev-parse", "HEAD"),
        "dirty": bool(git("status", "--porcelain")),
        "n_files_scanned": n_files,
        "scanner": "tools/leakcheck.py",
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"LEAKCHECK: {out['n_hits']} hits over {n_files} files "
          f"@ {out['commit'][:9]}{' (dirty)' if out['dirty'] else ''}")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
