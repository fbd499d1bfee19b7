"""CLI driver (⇔ bin/parse-syslog-line.pl): stdin mode + flag mapping."""

from __future__ import annotations

import json
import subprocess
import sys


def run_cli(args, stdin_text):
    return subprocess.run(
        [sys.executable, "-m", "pysyslog.cli", "--stdin", "--now", "1543622400", *args],
        input=stdin_text,
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )


def test_stdin_json():
    r = run_cli([], "May 19 22:03:29 janus sshd[10173]: hello\n")
    assert r.returncode == 0, r.stderr
    msg = json.loads(r.stdout.strip())
    assert msg["program_name"] == "sshd"
    assert msg["epoch"] == "1526767409"
    assert msg["host"] == "janus"


def test_stdin_flags():
    r = run_cli(
        ["--kv-detect", "--prune-raw", "--prune-empty"],
        "May 19 22:03:29 janus app: a=1 b=two\n",
    )
    msg = json.loads(r.stdout.strip())
    assert msg["SDATA"] == {"a": "1", "b": "two"}
    assert not [k for k in msg if k.endswith("_raw")]
    assert None not in msg.values()


def test_stdin_ddp_format():
    """`--format ddp` (alias print): Data::Printer-style hash dump —
    the reference CLI's default output (parse-syslog-line.pl:33)."""
    r = run_cli(["--format", "ddp", "--kv-detect"],
                "May 19 22:03:29 janus sshd[1]: ok user=bob\n")
    out = r.stdout
    assert out.startswith("{\n") and out.rstrip().endswith("}")
    assert 'program_name     "sshd"' in out or '"sshd"' in out
    assert "undef" in out  # None renders Perl-style
    assert 'user   "bob"' in out


def test_ddp_escapes_quotes_and_control_chars():
    """Strings with embedded quotes / backslashes / newlines must
    render unambiguously (⇔ Data::Printer's print_escapes; ADVICE r3:
    a bare f'\"{v}\"' produced a malformed dump)."""
    from pysyslog.cli import _ddp

    assert _ddp('say "hi"') == '"say \\"hi\\""'
    assert _ddp("back\\slash") == '"back\\\\slash"'
    assert _ddp("line\nbreak") == '"line\\nbreak"'
    r = run_cli(["--format", "ddp"],
                'May 19 22:03:29 janus app: quoted "x" tail\n')
    assert r.returncode == 0, r.stderr
    assert '\\"x\\"' in r.stdout


def test_stdin_no_program():
    r = run_cli(["--no-program"], "May 19 22:03:29 janus sshd[1]: hello\n")
    msg = json.loads(r.stdout.strip())
    assert "program_name" not in msg
    assert msg["content"] == "sshd[1]: hello"
