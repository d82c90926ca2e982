"""Docs-site builder (tools/build_docs.py) — the publishable equivalent of
the reference's Sphinx/readthedocs site (reference docs/conf.py, docs/*.rst).
"""

import importlib.util
import os
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load():
    pytest.importorskip("markdown")
    spec = importlib.util.spec_from_file_location(
        "build_docs", os.path.join(ROOT, "tools", "build_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_intra_repo_links_rewritten():
    bd = _load()
    text = ("see [usage](docs/usage.md) and [perf](performance.md#levers) "
            "but keep [ext](https://x.test/a.md) and [code](env.py)")
    out = bd._rewrite_links(text)
    assert "[usage](usage.html)" in out
    assert "[perf](performance.html#levers)" in out
    assert "https://x.test/a.md" in out          # external links untouched
    assert "[code](env.py)" in out               # non-page links untouched


@pytest.mark.slow
def test_full_site_builds(tmp_path):
    bd = _load()
    out = bd.main(str(tmp_path))
    pages = set(os.listdir(out))
    # every committed markdown page renders, plus index + API reference
    for expect in ("index.html", "overview.html", "usage.html",
                   "performance.html", "parity.html", "api_ref.html"):
        assert expect in pages, f"{expect} missing from built site"
    api = open(os.path.join(out, "api_ref.html")).read()
    # the API walk reached the core modules and their public symbols
    for anchor in ("red_gym_tpu.env", "red_gym_tpu.ops.scan_fast",
                   "red_gym_tpu.agents.ppo", "make_params"):
        assert anchor in api, f"{anchor} missing from API reference"
    perf = open(os.path.join(out, "performance.html")).read()
    assert "<table>" in perf, "markdown tables did not render"


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
