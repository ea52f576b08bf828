#!/usr/bin/env python3
"""Reference side of the differential schema fuzzer.

For every NNNN.kye in the given directory, runs the reference compiler
(kye.compile -> Compiled.to_dict) and writes NNNN.ref.json / NNNN.ref.yaml
(json.dumps(indent=2) / yaml.dump(sort_keys=False), byte-identical to
`kye -c out.json|out.yaml`), or NNNN.ref.err on rejection/crash.

Then compares against NNNN.ours.* and prints a divergence summary.

Usage: python3 tools/fuzz_ref.py <dir> [--max-report N]
"""
import json
import sys
from pathlib import Path

import yaml  # noqa: E402  (import BEFORE the sdk path: it ships a py2-era yaml)

# lark: prefer a pip-installed copy (`pip install -r
# /root/reference/requirements.txt` on a clean checkout); fall back to the
# google-cloud-sdk vendored copy only when absent (this sandbox has no pip
# egress)
try:
    import lark  # noqa: F401
except ImportError:
    sys.path.insert(0, '/usr/lib/google-cloud-sdk/lib/third_party')
sys.path.insert(0, '/root/reference')

from kye.kye import Kye  # noqa: E402


def compile_ref(src: str):
    """Returns ('ok', json_text, yaml_text) or ('err', reason, None)."""
    k = Kye()
    try:
        ok = k.compile(src)
    except Exception as e:  # reference crashes on several constructs
        return ('err', f'CRASH {type(e).__name__}: {e}', None)
    if not ok:
        msgs = [getattr(e, 'msg', str(e)) for e in k.reporter.errors]
        return ('err', '; '.join(msgs) or 'compile error', None)
    raw = k.compiled.to_dict()
    return ('ok', json.dumps(raw, sort_keys=False, indent=2),
            yaml.dump(raw, sort_keys=False))


def main():
    d = Path(sys.argv[1])
    max_report = int(sys.argv[sys.argv.index('--max-report') + 1]) if '--max-report' in sys.argv else 10
    cases = sorted(d.glob('*.kye'))
    n_ok = n_err = 0
    status_div = []   # ref ok, ours err (or vice versa)
    json_div = []
    yaml_div = []
    for f in cases:
        base = f.stem
        src = f.read_text()
        status, a, b = compile_ref(src)
        if status == 'ok':
            n_ok += 1
            (d / f'{base}.ref.json').write_text(a)
            (d / f'{base}.ref.yaml').write_text(b)
            ours_json = d / f'{base}.ours.json'
            if not ours_json.exists():
                status_div.append((base, 'ref OK, ours rejected: ' +
                                   (d / f'{base}.ours.err').read_text()[:120]))
                continue
            if ours_json.read_text() != a:
                json_div.append(base)
            ours_yaml = d / f'{base}.ours.yaml'
            if ours_yaml.exists() and ours_yaml.read_text() != b:
                yaml_div.append(base)
        else:
            n_err += 1
            (d / f'{base}.ref.err').write_text(a)
            if (d / f'{base}.ours.json').exists():
                status_div.append((base, f'ref rejected ({a[:90]}), ours OK'))
    print(f'[fuzz-ref] {len(cases)} cases: ref ok={n_ok} rejected={n_err}')
    print(f'  status divergences: {len(status_div)}')
    for b, why in status_div[:max_report]:
        print(f'    {b}: {why}')
    print(f'  json byte divergences: {len(json_div)} {json_div[:max_report]}')
    print(f'  yaml byte divergences: {len(yaml_div)} {yaml_div[:max_report]}')
    if not status_div and not json_div and not yaml_div:
        print('  ALL MATCH')
        return 0
    return 1


if __name__ == '__main__':
    sys.exit(main())
