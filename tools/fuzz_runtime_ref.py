#!/usr/bin/env python3
"""Reference side of the RUNTIME differential fuzzer.

Where tools/fuzz_ref.py differentially tests the COMPILE path (byte
parity of artifacts), this generates random (compiled artifact, data
table) pairs, drives the reference pandas Loader over them, and records
its exact flattened error rows + survivor count in the same block format
as src/test/resources/corpus/tests.json (artifact INLINE under
"artifactInline"). The Scala side replays every block with
graft.validate.CorpusReplay under strictReferenceParity.

Generation is seeded and type-correct (the reference VM crashes on
Python-type-mismatched expressions; those teach nothing), but the VALUE
space is adversarial: nulls, NaN, negatives, zero, duplicate index keys,
stringly-typed numeric columns (implicit-cast path), unknown columns,
missing index columns, sub-index conflicts, boolean inline args on
num-signature ops (Python bool-is-int), empty tables. Cases where the
reference itself CRASHES are recorded with a "crash" field — the replay
then only asserts that our engine completes cleanly (the documented
deviation class: e.g. mixed per-element array verdicts crash the
reference's Stack._preprocess).

Usage:
  python3 tools/fuzz_runtime_ref.py gen <out.json> --n 300 --seed 5001
"""
import argparse
import json
import math
import random
import sys

sys.path.insert(0, '/usr/lib/google-cloud-sdk/lib/third_party')  # vendored lark
sys.path.insert(0, '/root/reference')

import pandas as pd  # noqa: E402

from kye.kye import Kye  # noqa: E402
from kye.compiled import Compiled  # noqa: E402

EDGE_NAMES = ['a', 'b', 'c', 'd', 'e']
STRINGS = ['x', 'y', 'zz', 'ab', 'a b', '', 'q-1']
REGEXES = ['^a', 'b$', '[ab]+', 'a.b', 'z', '^$', 'q|x']


def rand_num(rng):
    return rng.choice([0.0, 1.0, 2.0, -1.0, -3.5, 0.5, 7.0, 100.0])


def rand_str(rng):
    return rng.choice(STRINGS)


def rand_bool(rng):
    return rng.choice([True, False])


def gen_expr(rng, edge_name, edge_type, depth=0):
    """Random type-correct postfix program over ONE edge, returning
    (cmds, out_type). cmds are {op: args} dicts; inline-vs-stacked VAL
    choice is random where the signature allows. Mirrors the op surface
    in graft.schema.Op / kye/vm/op.py."""
    t = edge_type  # 'Number' | 'String' | 'Boolean'

    def val(v):
        return {'val': v}

    def leaf():
        # the column itself, or a literal of its type
        if rng.random() < 0.7:
            return ([{'col': edge_name}], t)
        if t == 'Number':
            return ([val(rand_num(rng))], t)
        if t == 'String':
            return ([val(rand_str(rng))], t)
        return ([val(rand_bool(rng))], t)

    def build(want, d):
        if d >= 3 or rng.random() < 0.35:
            if want == t:
                return leaf()
            # literal of the wanted type
            if want == 'Number':
                return ([val(rand_num(rng))], want)
            if want == 'String':
                return ([val(rand_str(rng))], want)
            return ([val(rand_bool(rng))], want)
        roll = rng.random()
        if want == 'Boolean':
            if roll < 0.25 and t != 'Boolean':
                # comparison over the edge type
                lhs, _ = build(t, d + 1)
                op = rng.choice(['eq', 'ne'] + (['lt', 'gt', 'le', 'ge'] if t == 'Number' else []))
                # inline arg ('any' signature) or stacked; ~10%: a BOOLEAN
                # inline arg on a comparison (Python bool-is-int coercion)
                if rng.random() < 0.1 and t == 'Number':
                    arg = rand_bool(rng)
                else:
                    arg = rand_num(rng) if t == 'Number' else rand_str(rng)
                if rng.random() < 0.5:
                    return (lhs + [{op: arg}], 'Boolean')
                return (lhs + [val(arg), {op: []}], 'Boolean')
            if roll < 0.4:
                inner, _ = build('Boolean', d + 1)
                return (inner + [{'not': []}], 'Boolean')
            if roll < 0.55:
                l, _ = build('Boolean', d + 1)
                r, _ = build('Boolean', d + 1)
                op = rng.choice(['and', 'or'])
                return (l + r + [{op: []}], 'Boolean')
            if roll < 0.7:
                inner, _ = build(t, d + 1)
                op = rng.choice(['na', 'def'])
                return (inner + [{op: []}], 'Boolean')
            if roll < 0.8 and t == 'String':
                return ([{'col': edge_name}, {'matches': rng.choice(REGEXES)}], 'Boolean')
            # numeric threshold over a derived number
            num, _ = build('Number', d + 1)
            thr = rand_num(rng)
            op = rng.choice(['lt', 'gt', 'le', 'ge', 'eq', 'ne'])
            if rng.random() < 0.5:
                return (num + [{op: thr}], 'Boolean')
            return (num + [val(thr), {op: []}], 'Boolean')
        if want == 'Number':
            if t == 'String' and roll < 0.3:
                return ([{'col': edge_name}, {'len': []}], 'Number')
            if roll < 0.75:
                l, _ = build('Number', d + 1)
                op = rng.choice(['add', 'sub', 'mul', 'div', 'mod'])
                # ~8%: boolean inline arg on a num-signature op; for
                # div/mod force a ZERO divisor ~20% (IEEE inf / NaN paths
                # are rare through rand_num alone)
                if rng.random() < 0.08:
                    arg = rand_bool(rng)
                elif op in ('div', 'mod') and rng.random() < 0.2:
                    arg = 0.0
                else:
                    arg = rand_num(rng)
                if rng.random() < 0.5:
                    return (l + [{op: arg}], 'Number')
                return (l + [val(arg), {op: []}], 'Number')
            if roll < 0.85:
                l, _ = build('Number', d + 1)
                return (l + [{'neg': []}], 'Number')
            return build(t if t == 'Number' else 'Number', 3)
        if want == 'String':
            if roll < 0.5 and t == 'String':
                l, _ = build('String', d + 1)
                if rng.random() < 0.5:
                    return (l + [{'concat': rand_str(rng)}], 'String')
                r, _ = build('String', d + 1)
                return (l + r + [{'concat': []}], 'String')
            return build('String', 3)
        raise AssertionError(want)

    return build('Boolean', depth)


def gen_case(rng, case_id):
    n_edges = rng.randint(2, 4)
    names = EDGE_NAMES[:n_edges]
    edges = {}
    kinds = {}          # data kind per column: number|string|boolean
    titles = {}
    for i, nm in enumerate(names):
        ty = rng.choice(['Number', 'Number', 'String', 'String', 'Boolean'])
        e = {'type': ty}
        if i > 0:
            if rng.random() < 0.18:
                e['many'] = True
            if rng.random() < 0.22:
                e['none'] = True
        if rng.random() < 0.18:
            e['title'] = nm.upper() + '_t'
            titles[nm] = e['title']
        edges[nm] = e
        # stringly-typed numeric data exercises the implicit-cast path
        if ty == 'Number' and rng.random() < 0.25:
            kinds[nm] = 'string_numbers' if rng.random() < 0.6 else 'string_junk'
        else:
            kinds[nm] = {'Number': 'number', 'String': 'string', 'Boolean': 'boolean'}[ty]

    # index: first edge, sometimes composite, sometimes TWO sub-indexes
    # (exercises S5 sub-index uniqueness + S7 index conflicts)
    if n_edges >= 3 and rng.random() < 0.3:
        indexes = [[names[0]], [names[1]]]
    elif rng.random() < 0.25:
        indexes = [names[:2]]
    else:
        indexes = [[names[0]]]
    model = {'indexes': indexes, 'edges': edges}

    # assertions: 0-2 type-correct programs over single scalar edges
    # (the reference skips multi-edge assertions); ~7% target a many
    # edge (per-element path — may crash the reference, recorded)
    assertions = []
    for _ in range(rng.randint(0, 2)):
        candidates = [nm for nm in names
                      if not edges[nm].get('many') or rng.random() < 0.07]
        if not candidates:
            continue
        nm = rng.choice(candidates)
        if kinds[nm] in ('string_numbers', 'string_junk'):
            continue  # column type after cast is ambiguous; skip
        cmds, _ = gen_expr(rng, nm, edges[nm]['type'])
        assertions.append({'msg': f'fuzz_{case_id}_{len(assertions)}', 'expr': cmds})
    if assertions:
        model['assertions'] = assertions

    # data: 0-9 rows; duplicate index keys ~ exercise grouping
    n_rows = rng.choice([0, 3, 4, 5, 6, 8, 9])
    columns = []
    omit = set()
    if rng.random() < 0.06 and len(indexes) == 1 and len(indexes[0]) == 1:
        omit.add(indexes[0][0])  # missing index column -> abort
    for nm in names:
        if nm in omit:
            continue
        kind = kinds[nm]
        many = edges[nm].get('many', False)
        vals = []
        for r in range(n_rows):
            if rng.random() < 0.13:
                vals.append(None)
                continue
            if kind == 'number':
                v = rand_num(rng)
                if rng.random() < 0.06:
                    v = float('nan')
            elif kind == 'boolean':
                v = rand_bool(rng)
            elif kind == 'string_numbers':
                v = rng.choice(['1', '2.5', '-3', '0', '7'])
            elif kind == 'string_junk':
                v = rng.choice(['1', 'abc', '2.5', 'x'])
            else:
                v = rand_str(rng)
            if many and rng.random() < 0.5:
                # extras must match the column's declared data kind: the
                # fixture JSON records kind=string for the stringly-typed
                # cast paths, and a raw bool there would be read back as
                # the STRING "true" on the Scala side while the reference
                # sees Python True (float(True)=1.0) — an encoding
                # ambiguity, not an engine divergence (seed-5002 case 0091)
                k = rng.randint(0, 3)
                if kind == 'number':
                    extra = lambda: rand_num(rng)
                elif kind == 'boolean':
                    extra = lambda: rand_bool(rng)
                elif kind == 'string_numbers':
                    extra = lambda: rng.choice(['1', '2.5', '-3', '0', '7'])
                elif kind == 'string_junk':
                    extra = lambda: rng.choice(['1', 'abc', '2.5', 'x'])
                else:
                    extra = lambda: rand_str(rng)
                v = [v] + [extra() for _ in range(k)]
            vals.append(v)
        # duplicate an earlier row's value in index columns ~35%
        in_index = any(nm in sub for sub in indexes)
        if in_index and n_rows >= 2:
            for r in range(1, n_rows):
                if rng.random() < 0.35:
                    vals[r] = vals[rng.randrange(0, r)]
        data_kind = {'number': 'number', 'boolean': 'boolean'}.get(kind, 'string')
        columns.append({'name': titles.get(nm, nm), 'kind': data_kind,
                        'isList': many, 'values': vals})
    if rng.random() < 0.1:
        columns.append({'name': 'zz_unknown', 'kind': 'string', 'isList': False,
                        'values': [rand_str(rng) for _ in range(n_rows)]})
    return {'models': {'M': model}}, columns


def to_pandas(columns, n_rows):
    data = {}
    for c in columns:
        vals = []
        for v in c['values']:
            if v is None:
                vals.append(float('nan') if c['kind'] == 'number' else None)
            elif c['isList'] and not isinstance(v, list):
                vals.append([v])
            else:
                vals.append(v)
        data[c['name']] = vals
    return pd.DataFrame(data, columns=[c['name'] for c in columns],
                        index=range(n_rows))


def run_reference(artifact, columns):
    n_rows = len(columns[0]['values']) if columns else 0
    df = to_pandas(columns, n_rows)
    k = Kye()
    assert k.load_compiled(Compiled.from_dict(json.loads(json.dumps(artifact))))
    crash = None
    try:
        k.load_df('M', df)
    except Exception as e:  # noqa: BLE001 — reference crashes are data
        crash = f'{type(e).__name__}: {e}'
    golden = []
    for err in k.reporter.errors:
        rows = err.rows if err.rows else [None]
        edges = err.edges if err.edges else [None]
        for r in rows:
            for col in edges:
                golden.append({'err': err.err, 'model': err.model,
                               'row': None if r is None else int(r),
                               'col': col})
    table = k.loader.tables.get('M')
    aborted = table is None
    return {
        'goldenViolations': golden,
        'survivorCount': 0 if aborted else int(len(table)),
        'aborted': bool(aborted),
        'crash': crash,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('cmd', choices=['gen'])
    ap.add_argument('out')
    ap.add_argument('--n', type=int, default=300)
    ap.add_argument('--seed', type=int, default=5001)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    blocks = []
    n_crash = n_abort = 0
    for i in range(args.n):
        artifact, columns = gen_case(rng, i)
        try:
            ref = run_reference(artifact, columns)
        except Exception as e:  # generator produced an unloadable artifact
            print(f'case {i}: SKIP (harness error {type(e).__name__}: {e})')
            continue
        if ref['crash']:
            n_crash += 1
        if ref['aborted']:
            n_abort += 1
        blocks.append({
            'feature': 'runtime-fuzz',
            'artifactInline': artifact,
            'model': 'M',
            'tests': [{
                'test': f'case {i:04d} (seed {args.seed})',
                'model': 'M',
                'columns': columns,
                'goldenViolations': ref['goldenViolations'],
                'survivorCount': ref['survivorCount'],
                'aborted': ref['aborted'],
                **({'crash': ref['crash']} if ref['crash'] else {}),
            }],
        })
    with open(args.out, 'w') as f:
        json.dump(blocks, f, indent=1)
    print(f'wrote {len(blocks)} cases to {args.out} '
          f'({n_crash} reference crashes, {n_abort} aborted)')


if __name__ == '__main__':
    main()
