#!/usr/bin/env python
"""Generate the markdown API reference under docs/api/ from live docstrings.

The reference repo publishes a sphinx API site
(`/root/reference/.github/workflows/documentation.yaml`, `docs/source/*`);
this environment has no sphinx, so the equivalent here is a native
inspect-driven generator: one markdown page per subsystem, every public
class/function with its signature and docstring, plus an index. Re-run after
API changes:

    JAX_PLATFORMS=cpu python script/gen_api_docs.py

CI guard: tests/test_api_docs.py asserts the generated tree is current.
"""
import importlib
import inspect
import os
import pkgutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.pop('PALLAS_AXON_POOL_IPS', None)

PACKAGE = 'sc2bench_tpu'
OUT = ROOT / 'docs' / 'api'

# modules that must not be imported by the generator (side effects / heavy)
SKIP = {f'{PACKAGE}.utils.torch_ref_model', f'{PACKAGE}.utils.torch_golden',
        f'{PACKAGE}.utils.torch_convert'}


def iter_modules():
    pkg = importlib.import_module(PACKAGE)
    yield PACKAGE, pkg
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + '.'):
        if info.name in SKIP or info.name.rsplit('.', 1)[-1].startswith('_'):
            continue
        try:
            yield info.name, importlib.import_module(info.name)
        except Exception as e:  # torch-optional modules etc.
            print(f'skip {info.name}: {e}', file=sys.stderr)


def public_members(mod):
    names = getattr(mod, '__all__', None)
    out = []
    for name, obj in inspect.getmembers(mod):
        if name.startswith('_'):
            continue
        if names is not None and name not in names:
            continue
        if getattr(obj, '__module__', None) != mod.__name__:
            continue
        if inspect.isclass(obj) or inspect.isfunction(obj):
            out.append((name, obj))
    return out


def fmt_sig(obj):
    try:
        sig = inspect.signature(obj)
    except (ValueError, TypeError):
        return '(...)'
    # flax dataclass plumbing (parent/name) carries a sentinel default whose
    # repr embeds a memory address — drop it for deterministic output
    params = [p for p in sig.parameters.values()
              if p.name not in ('parent', 'name')
              or 'Sentinel' not in repr(p.default)]
    import re
    text = str(sig.replace(parameters=params,
                           return_annotation=inspect.Signature.empty))
    return re.sub(r' at 0x[0-9a-f]+', '', text)


def first_para(doc, owner_name=None):
    if not doc:
        return ''
    text = inspect.cleandoc(doc).split('\n\n')[0]
    # dataclass auto-docstring = the signature (with sentinel reprs) — skip
    if owner_name and text.startswith(owner_name + '('):
        return ''
    return text


def render_module(name, mod):
    lines = [f'# `{name}`', '']
    if mod.__doc__:
        lines += [inspect.cleandoc(mod.__doc__), '']
    members = public_members(mod)
    for mname, obj in members:
        kind = 'class' if inspect.isclass(obj) else 'def'
        lines.append(f'## `{kind} {mname}{fmt_sig(obj)}`')
        lines.append('')
        doc = first_para(obj.__doc__, mname)
        if doc:
            lines += [doc, '']
        if inspect.isclass(obj):
            for m_name, meth in inspect.getmembers(obj, inspect.isfunction):
                if m_name.startswith('_') or meth.__qualname__.split('.')[0] \
                        != obj.__name__:
                    continue
                lines.append(f'### `{mname}.{m_name}{fmt_sig(meth)}`')
                lines.append('')
                mdoc = first_para(meth.__doc__)
                if mdoc:
                    lines += [mdoc, '']
    return '\n'.join(lines).rstrip() + '\n', bool(members or mod.__doc__)


def main(check=False):
    pages = {}
    index = ['# API reference', '',
             'Generated from docstrings by `script/gen_api_docs.py` — '
             'regenerate after API changes.', '']
    for name, mod in sorted(iter_modules(), key=lambda kv: kv[0]):
        if hasattr(mod, '__path__') and name != PACKAGE:
            continue  # subpackage __init__ re-export shims: skip
        text, keep = render_module(name, mod)
        if not keep:
            continue
        fname = name.replace('.', '_') + '.md'
        pages[fname] = text
        hook = first_para(mod.__doc__).split('\n')[0] if mod.__doc__ else ''
        index.append(f'- [`{name}`]({fname}) — {hook}')
    pages['index.md'] = '\n'.join(index).rstrip() + '\n'

    if check:
        stale = []
        for fname, text in pages.items():
            p = OUT / fname
            if not p.exists() or p.read_text() != text:
                stale.append(fname)
        extra = {p.name for p in OUT.glob('*.md')} - set(pages)
        if stale or extra:
            print(f'stale: {stale} extra: {sorted(extra)}', file=sys.stderr)
            return 1
        print(f'{len(pages)} pages current')
        return 0

    OUT.mkdir(parents=True, exist_ok=True)
    for p in OUT.glob('*.md'):
        p.unlink()
    for fname, text in pages.items():
        (OUT / fname).write_text(text)
    print(f'wrote {len(pages)} pages to {OUT}')
    return 0


if __name__ == '__main__':
    sys.exit(main(check='--check' in sys.argv))
