"""Golden-corpus loader + canonical comparison.

Loads the reference's committed fixture corpus directly from
/root/reference/t/data/*.yaml at test time (fixture layout
{name, string, options?, expected} per t/lib/test/Data.pm:30-33).
The YAMLs are read in place — never copied into this repo.

Canonicalization rules mirror the reference harness:
* the harness compares with Perl is_deeply, where "10173" eq 10173 —
  so numbers and numeric strings canonicalize to the same form;
* `_json_error` location suffix is trimmed (t/lib/test/Data.pm:79); we
  additionally compare only presence+prefix because the JSON library
  differs (documented deviation, parser_core module docstring).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any

REFERENCE_DATA_DIR = os.environ.get(
    "PSL_REFERENCE_DATA", "/root/reference/t/data"
)

# Pinned harness constants (t/01-parse.t:17-20; also used by the fixture
# generator t/bin/create-test-entry.pl:39)
GOLDEN_NOW_ISO = "2018-12-01T00:00:00Z"
GOLDEN_NOW_EPOCH = 1543622400.0
GOLDEN_TZ = "UTC"


def _fixture_loader():
    import yaml

    class FixtureLoader(yaml.SafeLoader):
        pass

    # Keep dates/times/numbers as plain strings: golden equality is
    # string-form (and YAML 1.1 would read `time: 11:28:13` as the
    # sexagesimal int 41293).  Null/bool resolution is kept.
    # bool dropped as well: YAML 1.1 would turn `encrypted: No` /
    # `tunnel-inspection: Off` into booleans; Perl sees plain strings.
    drop = {
        "tag:yaml.org,2002:timestamp",
        "tag:yaml.org,2002:int",
        "tag:yaml.org,2002:float",
        "tag:yaml.org,2002:bool",
    }
    for ch, resolvers in list(FixtureLoader.yaml_implicit_resolvers.items()):
        FixtureLoader.yaml_implicit_resolvers[ch] = [
            (t, r) for t, r in resolvers if t not in drop
        ]
    return FixtureLoader


def load_fixtures(data_dir: str = REFERENCE_DATA_DIR) -> dict[str, dict]:
    """fixture_id -> {name, string, options, expected}."""
    import yaml

    loader = _fixture_loader()
    out = {}
    for path in sorted(glob.glob(os.path.join(data_dir, "*.yaml"))):
        with open(path) as fh:
            d = yaml.load(fh, Loader=loader)
        fid = os.path.basename(path).split(".")[0]
        out[fid] = {
            "fixture_id": fid,
            "name": d.get("name", fid),
            "string": d["string"],
            "options": d.get("options", {}) or {},
            "expected": d["expected"],
        }
    return out


def canon(x: Any) -> Any:
    """Canonical form for golden comparison (Perl eq semantics)."""
    if x is None:
        return None
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, int):
        return str(x)
    if isinstance(x, float):
        return repr(x)
    if isinstance(x, dict):
        return {str(k): canon(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [canon(v) for v in x]
    return str(x)


def canonical_json(record: dict) -> str:
    """Stable JSON rendering of a parsed record (sorted keys)."""
    return json.dumps(canon(record), sort_keys=True, ensure_ascii=False,
                      separators=(",", ":"))


def normalize_json_error(rec: dict) -> dict:
    """Presence+prefix comparison for _json_error (see module doc)."""
    if "_json_error" in rec:
        rec = dict(rec)
        rec["_json_error"] = "Failed to decode json"
    return rec


def diff_records(got: dict, want: dict) -> list[str]:
    """Human-readable field diffs after canonicalization; [] == equal."""
    g = canon(normalize_json_error(got))
    w = canon(normalize_json_error(want))
    problems = []
    for k in sorted(set(g) | set(w)):
        if k not in g:
            problems.append(f"missing key {k!r} (want {w[k]!r})")
        elif k not in w:
            problems.append(f"extra key {k!r} (got {g[k]!r})")
        elif g[k] != w[k]:
            problems.append(f"{k}: got {g[k]!r} want {w[k]!r}")
    return problems
