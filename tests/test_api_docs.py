"""Generated API reference stays current (docs/api/ vs live docstrings).

The reference publishes a sphinx API site; ours is generated markdown
(`script/gen_api_docs.py`). This guard fails CI when a public signature or
docstring changes without regenerating.
"""
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_api_docs_current():
    proc = subprocess.run(
        [sys.executable, str(ROOT / 'script' / 'gen_api_docs.py'),
         '--check'],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, \
        f'docs/api stale — rerun script/gen_api_docs.py\n{proc.stderr}'
