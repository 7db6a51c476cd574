"""Checked-in API docs must match the live docstrings (VERDICT r4
weak #7: two pages drifted when a docstring edit skipped the regen).
Renders every documented module in-process and diffs against the
committed pages — failing here means `python docs/gen_api.py` was not
re-run after a docstring change."""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_gen_api():
    spec = importlib.util.spec_from_file_location(
        'gen_api', REPO / 'docs' / 'gen_api.py')
    mod = importlib.util.module_from_spec(spec)
    sys.modules['gen_api'] = mod
    spec.loader.exec_module(mod)
    return mod


def test_api_docs_in_sync():
    gen = _load_gen_api()
    stale = []
    for modname in gen.MODULES:
        fname = modname.replace('.', '_') + '.md'
        path = REPO / 'docs' / 'api' / fname
        if not path.exists():
            stale.append(fname + ' (missing)')
            continue
        if path.read_text() != gen.render(modname):
            stale.append(fname)
    assert not stale, (
        'API docs drifted from docstrings; re-run `python '
        'docs/gen_api.py` and commit: %s' % ', '.join(stale))
