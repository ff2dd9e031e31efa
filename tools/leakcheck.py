#!/usr/bin/env python3
"""Repo-side leak scan with run provenance.

The per-round LEAKCHECK.json historically carried only {round, n_hits,
hits} — a round bump with zero provenance is indistinguishable from a
hand-edit (r10 ADVICE). This tool performs the scan itself and stamps
WHAT it scanned: file count, a corpus digest (md5 over the sorted
per-file digests of every scanned file), the git sha, and a timestamp,
so a committed record provably reflects a real sweep of that tree.

Categories mirror the driver artifact's keys. Patterns are deliberately
generic "this does not belong in a from-public-knowledge repo" shapes:
non-public imports/packages, URLs outside an allowlist of public hosts,
object-store bucket URIs, chat/shortlink references, credential-looking
strings, and environment variables outside the build's public surface.

Usage:
  tools/leakcheck.py           # print the stamped JSON
  tools/leakcheck.py --write N # write LEAKCHECK.json with round=N

Driver-side tooling only (python3 stdlib); not part of the library.
"""
import glob
import hashlib
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCAN_GLOBS = ["src/**/*.scala", "tools/*.py", "*.sbt", "project/*",
              "*.md", ".claude/**/*.md"]
# Anchored on the REGISTRABLE domain: a substring match would bless any
# internal host that merely contains a public keyword
# (github-mirror.internal.io, apache.corp.example.com).
PUBLIC_HOSTS = re.compile(
    r"https?://(localhost|127\.0\.0\.1|([\w-]+\.)*(apache\.org|github\.com|"
    r"github\.io|scala-lang\.org|scalatest\.org|duckdb\.org|wikipedia\.org|"
    r"arxiv\.org|acm\.org|vldb\.org|postgresql\.org|python\.org|"
    r"example\.com))([:/]|$)")
ENV_ALLOW = re.compile(
    r"^(SPARK_|JAVA_|COURSIER_|SBT_|HOME$|PATH$|USER$|TZ$|LANG$|TERM$)")

CATEGORIES = {
    # imports rooted in an org-style namespace that is not the public
    # surface (org.apache/scalatest/scalacheck are allowed; local value
    # imports like `spark.implicits._` have no such root and never match)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache|org\.scalatest|org\.scalacheck"
        r"|com\.sun\.)"  # com.sun.* ships with the JDK
        r"(?:com|net|io|ai|co|org|dev)\.\S+", re.M),
    "internal-url": re.compile(r"https?://[\w.-]+[\w/]"),
    "internal-pkg2": re.compile(
        r"^\s*package\s+(?!graft\b|graft\.)\S+", re.M),
    "internal-bucket": re.compile(r"\b(s3a?|gs|abfss?|wasbs?)://[\w.-]+"),
    "slack-link": re.compile(
        r"\b[\w.-]*slack\.com|(?<![\w./-])go/[a-z][\w-]{2,}"),
    "api-key": re.compile(
        r"\b(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{24,}|ghp_[A-Za-z0-9]{36}|"
        r"xox[baprs]-[A-Za-z0-9-]{10,})\b"),
    # env-var reads beyond the documented public build surface
    "axon-env": re.compile(r"""sys\.env(?:\.getOrElse|\.get)?\(['"](\w+)"""),
}


def scan():
    files = sorted(set(
        f for g in SCAN_GLOBS
        for f in glob.glob(os.path.join(ROOT, g), recursive=True)
        if os.path.isfile(f)))
    hits = {k: [] for k in CATEGORIES}
    digests = []
    for f in files:
        data = open(f, "rb").read()
        digests.append(hashlib.md5(data).hexdigest())
        text = data.decode("utf-8", errors="replace")
        rel = os.path.relpath(f, ROOT)
        is_md = rel.endswith(".md")
        for cat, rx in CATEGORIES.items():
            # PAPERS.md/SNIPPETS.md quote retrieved PUBLIC code verbatim —
            # import/package shapes there are citations, not leaks; URL,
            # bucket, shortlink, and credential scans still apply to them
            if is_md and cat in ("internal-import", "internal-pkg2"):
                continue
            for m in rx.finditer(text):
                tok = m.group(0).strip()
                if cat == "internal-url" and PUBLIC_HOSTS.match(tok):
                    continue
                if cat == "axon-env" and ENV_ALLOW.match(m.group(1)):
                    continue
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append("%s:%d: %s" % (rel, line, tok[:120]))
    corpus = hashlib.md5("".join(digests).encode()).hexdigest()
    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                             capture_output=True, text=True,
                             timeout=10).stdout.strip() or "unknown"
    except Exception:
        sha = "unknown"
    return {
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "provenance": {
            "scanned_files": len(files),
            "corpus_md5": corpus,
            "git_sha": sha,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "tool": "tools/leakcheck.py",
        },
    }


def main():
    rec = scan()
    if "--write" in sys.argv:
        rec = {"round": int(sys.argv[sys.argv.index("--write") + 1]), **rec}
        with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as fh:
            json.dump(rec, fh, indent=2)
        print("wrote LEAKCHECK.json: %d hits over %d files" %
              (rec["n_hits"], rec["provenance"]["scanned_files"]))
    else:
        print(json.dumps(rec, indent=2))
    return 0 if rec["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
