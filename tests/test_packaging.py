"""dist/pysyslog.zip is the spark-submit --py-files artifact the north
rule ships (BASELINE.json: "run via spark-submit --py-files").  A stale
zip deploys old code silently — found in round 6 carrying round-2
sources.  Regenerate with scripts/make_pyfiles.sh."""

from __future__ import annotations

import pathlib
import subprocess
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_pyfiles_zip_matches_source_tree():
    # dist/ is gitignored (build artifact): on a clean checkout this
    # builds the zip — exercising the packaging script — and on a dirty
    # tree it catches a stale zip
    if not (REPO / "dist" / "pysyslog.zip").exists():
        subprocess.run(["bash", str(REPO / "scripts" / "make_pyfiles.sh")],
                       check=True, capture_output=True)
    src = {p.relative_to(REPO).as_posix(): p.read_bytes()
           for p in sorted((REPO / "pysyslog").rglob("*.py"))}
    with zipfile.ZipFile(REPO / "dist" / "pysyslog.zip") as z:
        names = set(z.namelist())
        assert names == set(src), (
            f"zip/source tree differ: only-in-zip={names - set(src)}, "
            f"only-in-tree={set(src) - names} — run scripts/make_pyfiles.sh")
        for n in sorted(names):
            assert z.read(n) == src[n], (
                f"{n} is stale in dist/pysyslog.zip — "
                "run scripts/make_pyfiles.sh")
