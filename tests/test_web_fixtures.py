"""CI-runnable qb3.js regression tripwires (no JS runtime in this image,
web/README.md documents the one-command browser check).

What CAN be checked from Python: the committed conformance fixtures must
equal a fresh regeneration from this engine (oracle-pinned streams), and
qb3.js must keep the API surface and format constants the fixtures
exercise.  A qb3.js edit that breaks decode still needs the browser page;
an edit that breaks its contract or stale fixtures fails HERE."""

import os
import re
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
WEB = os.path.join(ROOT, "web")


def test_fixtures_match_regeneration(tmp_path):
    """web/test/fixtures.js == fresh output of tools/gen_web_fixtures.py."""
    with open(os.path.join(WEB, "test", "fixtures.js"), "rb") as f:
        committed = f.read()
    env = dict(os.environ, QB3_FIXTURES_OUT=str(tmp_path / "fixtures.js"))
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "tools", "gen_web_fixtures.py")],
                   check=True, env=env, cwd=ROOT, capture_output=True)
    out = tmp_path / "fixtures.js"
    path = out if out.exists() else os.path.join(WEB, "test", "fixtures.js")
    with open(path, "rb") as f:
        fresh = f.read()
    assert fresh == committed, "fixtures.js is stale: rerun gen_web_fixtures"


def test_qb3js_surface():
    with open(os.path.join(WEB, "qb3.js")) as f:
        src = f.read()
    # public API the demo pages / lite clients rely on
    assert re.search(r"export function getInfo", src)
    assert re.search(r"export function decode", src)
    # format constants the fixtures exercise (stream magic, curves)
    assert "QB3\\x80" in src or "0x80" in src
    assert re.search(r"0x0145236789CDABEF", src, re.I), "z-curve constant"
    assert re.search(r"0x01548CD9AEFB7623", src, re.I), "hilbert constant"
    # BigInt path for 64-bit dtypes must stay
    assert "BigUint64Array" in src


def test_runner_page_contract():
    with open(os.path.join(WEB, "test", "run.html")) as f:
        src = f.read()
    assert "QB3_RESULTS" in src  # machine-readable result hook
    assert re.search(r"import .* from \"\.\./qb3\.js\"", src)
