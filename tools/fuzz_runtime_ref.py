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

# lark: prefer a pip-installed copy (`pip install -r
# /root/reference/requirements.txt` on a clean checkout); fall back to the
# google-cloud-sdk vendored copy only when absent (this sandbox has no pip
# egress)
try:
    import lark  # noqa: F401
except ImportError:
    sys.path.insert(0, '/usr/lib/google-cloud-sdk/lib/third_party')
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
            # r5 extension branches: the forms the original generator never
            # produced, each a divergence class the review/probes found
            pre = rng.random()
            if pre < 0.10 and t == 'Boolean':
                # bool+bool / bool*bool arithmetic (numpy logical OR/AND,
                # result dtype bool) compared numerically or as str
                op = rng.choice(['add', 'mul'])
                arith = [{'col': edge_name}]
                if rng.random() < 0.5:
                    arith.append({op: rand_bool(rng)})
                else:
                    arith.extend([val(rand_bool(rng)), {op: []}])
                if rng.random() < 0.3:
                    return (arith + [{'cast': 'str'},
                            {'eq': rng.choice(['True', 'False', 'true'])}], 'Boolean')
                return (arith + [{rng.choice(['eq', 'ne']):
                        rng.choice([0.0, 1.0, 2.0])}], 'Boolean')
            if pre < 0.16 and t == 'Number':
                # cast-str round trip: int64 vs float64 renderings differ
                # ("2" vs "2.0") and must match pandas astype(str)
                return ([{'col': edge_name}, {'cast': 'str'},
                        {rng.choice(['eq', 'ne']):
                         rng.choice(['1.0', '2.5', '-3.0', '7', '100', 'x'])}], 'Boolean')
            if pre < 0.20 and t == 'Boolean':
                # Python str(bool) is "True"/"False", not Spark's "true"
                return ([{'col': edge_name}, {'cast': 'str'},
                        {'eq': rng.choice(['True', 'False', 'true'])}], 'Boolean')
            if pre < 0.30 and t == 'String':
                # cross-type comparison: == / != complete elementwise-False
                # in Python; ordered comparisons crash the reference
                arg = rand_num(rng) if rng.random() < 0.5 else rand_bool(rng)
                op = (rng.choice(['lt', 'gt', 'le', 'ge'])
                      if rng.random() < 0.3 else rng.choice(['eq', 'ne']))
                if rng.random() < 0.5:
                    return ([{'col': edge_name}, {op: arg}], 'Boolean')
                return ([{'col': edge_name}, val(arg), {op: []}], 'Boolean')
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
                # ~30% inline scalar right operand: semantics differ from
                # the stacked form (keeps the left index — no False-poison)
                if rng.random() < 0.3:
                    return (l + [{op: rand_bool(rng)}], 'Boolean')
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
                    # IEEE/NaN zero-divisor paths; int 0 exercises the
                    # plan-time literal-zero specialization too
                    arg = rng.choice([0.0, 0])
                elif rng.random() < 0.25:
                    # Python INT literal: pandas keeps int64 exact through
                    # int-int arithmetic (5 % 3 -> "2", not "2.0")
                    arg = rng.choice([1, 2, 3, 7, -3])
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


def inline_bool_arith(cmds):
    """Rewrite `..., {val: bool}, {add|mul: []}` to the inline-arg form.

    Over a bool column CONTAINING nulls, the stacked form's full-index VAL
    alignment flips pandas to object dtype and PYTHON semantics (True*True
    == 1, str '1') — a value-dependent dtype pathology the Spark engine
    deliberately does not reproduce (documented deviation). The inline raw
    scalar keeps the left index and numpy semantics regardless of nulls,
    so generated corpora use it whenever the target column is nullable."""
    out, i = [], 0
    while i < len(cmds):
        c = cmds[i]
        nxt = cmds[i + 1] if i + 1 < len(cmds) else None
        if (isinstance(c, dict) and set(c) == {'val'}
                and isinstance(c['val'], bool)
                and isinstance(nxt, dict) and len(nxt) == 1
                and next(iter(nxt)) in ('add', 'mul')
                and next(iter(nxt.values())) == []):
            out.append({next(iter(nxt)): c['val']})
            i += 2
        else:
            out.append(c)
            i += 1
    return out


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
        # stringly-typed numeric data exercises the implicit-cast path;
        # r6: half of those ALSO get a title rename, so one case chains
        # title-resolution -> implicit cast -> downstream stages
        if ty == 'Number' and rng.random() < 0.25:
            kinds[nm] = 'string_numbers' if rng.random() < 0.6 else 'string_junk'
            if 'title' not in e and rng.random() < 0.5:
                e['title'] = nm.upper() + '_t'
                titles[nm] = e['title']
        elif ty == 'Number' and rng.random() < 0.2:
            # int64 data (never null/NaN — a single missing value would
            # silently flip the pandas dtype to float64 while the Spark
            # side stays LongType: an encoding ambiguity, not a divergence)
            kinds[nm] = 'integer'
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
    # (the reference skips multi-edge assertions); ~15% target a many
    # edge (per-element path — may crash the reference, recorded; r6
    # broadened from 7%: the list-cell S4 path was the thinnest shape)
    assertions = []
    for _ in range(rng.randint(0, 2)):
        candidates = [nm for nm in names
                      if not edges[nm].get('many') or rng.random() < 0.15]
        if not candidates:
            continue
        nm = rng.choice(candidates)
        if kinds[nm] in ('string_numbers', 'string_junk'):
            continue  # column type after cast is ambiguous; skip
        if kinds[nm] == 'integer' and not edges[nm].get('many') and rng.random() < 0.3:
            # int64-specific dispatch the typed gen_expr can't produce:
            # &/| against a bool (numpy bitwise against 0/1, bool result),
            # &/| against ANOTHER int64 (numpy bitwise, INT64 result —
            # r6: no longer masked), ~ (bitwise invert), int64-preserving
            # arithmetic derivations; str-blind here since the edge is
            # Number. Inline int args on and/or are ILLEGAL (op signature),
            # so int operands are always stacked.
            roll = rng.random()
            if roll < 0.25:
                cmds = [{'col': nm}, {rng.choice(['and', 'or']): rand_bool(rng)}]
            elif roll < 0.4:
                cmds = [{'col': nm}, {'val': rand_bool(rng)},
                        {rng.choice(['and', 'or']): []}]
            elif roll < 0.75:
                # int64 & int64: col op (col | int-literal | derived-int),
                # usually fed into a comparison (mid-expression bitwise
                # value), sometimes left RAW as the verdict (reference:
                # all-nonzero = silent pass, any-zero = KeyError crash —
                # recorded either way)
                lhs = [{'col': nm}]
                if rng.random() < 0.4:
                    # int64-preserving arithmetic derivation on the left
                    lhs += [{'val': rng.choice([1, 2, 3, -1])},
                            {rng.choice(['add', 'sub', 'mul']): []}]
                if rng.random() < 0.5:
                    rhs = [{'val': rng.choice([1, 2, 4, 6, 7, -3, 0])}]
                else:
                    rhs = [{'col': nm}]
                cmds = lhs + rhs + [{rng.choice(['and', 'or']): []}]
                if rng.random() < 0.7:
                    cmds += [{rng.choice(['eq', 'ne', 'lt', 'ge']):
                              float(rng.choice([0, 1, 4, 6, -1]))}]
            else:
                cmds = [{'col': nm}, {'not': []},
                        {rng.choice(['eq', 'ne', 'lt', 'ge']):
                         float(rng.choice([-6, -3, -1, 0]))}]
        else:
            cmds, _ = gen_expr(rng, nm, edges[nm]['type'])
        assertions.append({'msg': f'fuzz_{case_id}_{len(assertions)}', 'expr': cmds})
    if assertions:
        model['assertions'] = assertions

    # data: 0-9 rows; duplicate index keys ~ exercise grouping
    n_rows = rng.choice([0, 3, 4, 5, 6, 8, 9])
    columns = []
    null_edges = set()
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
            if rng.random() < 0.13 and kind != 'integer':
                vals.append(None)
                continue
            if kind == 'integer':
                v = rng.choice([0, 1, 2, 5, 7, -3, 100])
            elif kind == 'number':
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
                if kind == 'integer':
                    extra = lambda: rng.choice([0, 1, 2, 5, 7, -3, 100])
                elif kind == 'number':
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
        # an ALL-null boolean column degrades to pandas object-of-Nones and
        # the reference flags InvalidType purely from the lost dtype — a
        # fixture-encoding boundary (Spark keeps the declared BooleanType),
        # not an engine semantic: keep one real value (probed r5; all-null
        # String stays object and passes, all-null Number stays float64)
        if kind == 'boolean' and n_rows > 0 and all(v is None for v in vals):
            vals[rng.randrange(n_rows)] = rand_bool(rng)
        data_kind = {'number': 'number', 'boolean': 'boolean',
                     'integer': 'integer'}.get(kind, 'string')
        columns.append({'name': titles.get(nm, nm), 'kind': data_kind,
                        'isList': many, 'values': vals})
        if any(v is None for v in vals):
            null_edges.add(nm)
    if rng.random() < 0.1:
        columns.append({'name': 'zz_unknown', 'kind': 'string', 'isList': False,
                        'values': [rand_str(rng) for _ in range(n_rows)]})
    # avoid the object-dtype pathology: stacked VAL bool-arith over a
    # null-bearing column switches the reference to Python int semantics
    # (see inline_bool_arith) — keep that class out of generated corpora
    for a in model.get('assertions', []):
        # gate on ANY referenced column being null-bearing: a nested
        # bool-arith can sit behind a leading VAL literal, so expr[0]
        # alone under-matches
        refs = {c['col'] for c in a['expr']
                if isinstance(c, dict) and set(c) == {'col'}}
        if refs & null_edges:
            a['expr'] = inline_bool_arith(a['expr'])
    models = {'M': model}
    if rng.random() < 0.2:
        # r6: a second, never-loaded model in the same artifact — the
        # loader must validate ONLY the targeted model; its edges reuse
        # names from M (scoping bug bait) with different types/assertions
        models['N'] = {
            'indexes': [['a']],
            'edges': {'a': {'type': 'Number'},
                      'b': {'type': 'String'}},
            'assertions': [{'msg': f'fuzz_{case_id}_other',
                            'expr': [{'col': 'a'}, {'ge': 0.0}]}]}
    return {'models': models}, columns


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


def probe_cases():
    """The r5 hand-probe suite: one (name, edges, assertion expr, columns)
    per empirically-verified semantic (inline-vs-stacked logical args,
    bool-is-int arithmetic dispatch, IEEE div/mod zero paths incl. the
    -0.0 divisor sign, int64 literal typing through cast-str, cross-type
    comparisons). Regenerating with `probes` re-derives every golden from
    the live reference."""
    numcol = lambda vals: [
        {'name': 'i', 'kind': 'number', 'isList': False,
         'values': [float(r + 1) for r in range(len(vals))]},
        {'name': 'a', 'kind': 'number', 'isList': False, 'values': vals}]
    nullnum = {'i': {'type': 'Number'}, 'a': {'type': 'Number', 'none': True}}
    num = {'i': {'type': 'Number'}, 'a': {'type': 'Number'}}
    boole = {'i': {'type': 'Number'}, 'f': {'type': 'Boolean'}}
    stre = {'i': {'type': 'Number'}, 's': {'type': 'String'}}
    fcol = [
        {'name': 'i', 'kind': 'number', 'isList': False, 'values': [1.0, 2.0]},
        {'name': 'f', 'kind': 'boolean', 'isList': False, 'values': [True, False]}]
    scol = [
        {'name': 'i', 'kind': 'number', 'isList': False, 'values': [1.0, 2.0]},
        {'name': 's', 'kind': 'string', 'isList': False, 'values': ['x', 'y']}]
    icol = [
        {'name': 'i', 'kind': 'number', 'isList': False, 'values': [1.0]},
        {'name': 'a', 'kind': 'integer', 'isList': False, 'values': [5]}]
    icol3 = [
        {'name': 'i', 'kind': 'number', 'isList': False, 'values': [1.0, 2.0, 3.0]},
        {'name': 'a', 'kind': 'integer', 'isList': False, 'values': [5, 2, 0]}]
    nv = numcol([None, 10.0, 1.0])
    gt5 = [{'col': 'a'}, {'gt': 5.0}]
    return [
        ('inline_or_true',   nullnum, gt5 + [{'or': True}], nv),
        ('inline_or_false',  nullnum, gt5 + [{'or': False}], nv),
        ('inline_and_true',  nullnum, gt5 + [{'and': True}], nv),
        ('inline_and_false', nullnum, gt5 + [{'and': False}], nv),
        ('stacked_or_true',  nullnum, gt5 + [{'val': True}, {'or': []}], nv),
        ('stacked_or_false', nullnum, gt5 + [{'val': False}, {'or': []}], nv),
        ('bool_add_stacked', boole,
         [{'col': 'f'}, {'val': True}, {'add': []}, {'eq': 1.0}], fcol),
        ('bool_add_inline', boole,
         [{'col': 'f'}, {'add': True}, {'eq': 1.0}], fcol),
        ('bool_mul_stacked', boole,
         [{'col': 'f'}, {'val': True}, {'mul': []}, {'eq': 1.0}], fcol),
        ('bool_add_eq2', boole,
         [{'col': 'f'}, {'add': True}, {'eq': 2.0}], fcol),
        ('bool_add_chain_num', boole,
         [{'col': 'f'}, {'val': True}, {'add': []}, {'val': 1.0}, {'add': []},
          {'eq': 2.0}], fcol),
        ('bool_add_cast_str', boole,
         [{'col': 'f'}, {'val': True}, {'add': []}, {'cast': 'str'},
          {'eq': 'True'}], fcol),
        ('bool_cast_str', boole,
         [{'col': 'f'}, {'cast': 'str'}, {'eq': 'True'}], fcol),
        ('nan_div_zero', num,
         [{'col': 'a'}, {'val': 0.0}, {'div': []}, {'val': 0.0}, {'div': []},
          {'gt': 0.0}], numcol([0.0])),
        ('div_neg_zero', num,
         [{'col': 'a'}, {'val': 0.0}, {'neg': []}, {'div': []}, {'gt': 0.0}],
         numcol([7.0])),
        ('int_mod_cast_str', num,
         [{'col': 'a'}, {'mod': 3}, {'cast': 'str'}, {'eq': '2'}], icol),
        ('int_mod_float_cast_str', num,
         [{'col': 'a'}, {'mod': 3.0}, {'cast': 'str'}, {'eq': '2.0'}], icol),
        ('int_mod_neg_cast_str', num,
         [{'col': 'a'}, {'mod': -3}, {'cast': 'str'}, {'eq': '-1'}], icol),
        ('num_add_bool_inline', num,
         [{'col': 'a'}, {'add': True}, {'eq': 6.0}], numcol([5.0])),
        ('num_eq_bool_inline', num,
         [{'col': 'a'}, {'eq': True}], numcol([1.0, 0.0])),
        ('str_eq_bool', stre, [{'col': 's'}, {'eq': True}], scol),
        ('str_eq_bool_stacked', stre,
         [{'col': 's'}, {'val': True}, {'eq': []}], scol),
        ('str_eq_num', stre, [{'col': 's'}, {'eq': 5.0}], scol),
        ('str_ne_bool', stre, [{'col': 's'}, {'ne': True}], scol),
        ('str_lt_num_crash', stre, [{'col': 's'}, {'lt': 5.0}], scol),
        ('len_on_num_crash', num,
         [{'col': 'a'}, {'len': []}, {'gt': 0.0}], numcol([5.0])),
        # int64 meets bool on &/|: numpy bitwise against 0/1, BOOLEAN result
        ('int_and_true_inline', num, [{'col': 'a'}, {'and': True}], icol3),
        ('int_or_false_inline', num, [{'col': 'a'}, {'or': False}], icol3),
        ('int_or_bool_stacked', num,
         [{'col': 'a'}, {'val': True}, {'or': []}], icol3),
        # ~int64 is bitwise invert (~5 == -6)
        ('int_not_bitwise', num,
         [{'col': 'a'}, {'not': []}, {'eq': -6.0}], [
            {'name': 'i', 'kind': 'number', 'isList': False, 'values': [1.0, 2.0]},
            {'name': 'a', 'kind': 'integer', 'isList': False, 'values': [5, 2]}]),
        # int64 % False = numpy integer mod-by-zero: 0, int64 ("0" via
        # cast-str) — pandas NaN-intercepts only NUMERIC zero divisors
        ('int_mod_false', num,
         [{'col': 'a'}, {'val': False}, {'mod': []}, {'cast': 'str'}, {'eq': '0'}], icol),
        ('int_mod_false_inline_le', num,
         [{'col': 'a'}, {'mod': False}, {'le': -3.5}], icol3),
        # str * bool is bool-is-int repeat ('x' * True = 'x', * False = '')
        ('str_mul_true_inline', stre,
         [{'col': 's'}, {'mul': True}, {'eq': 'x'}], scol),
        ('str_mul_false_stacked', stre,
         [{'col': 's'}, {'val': False}, {'mul': []}, {'eq': ''}], scol),
        # --- r6: int64 meets int64 on &/| (numpy bitwise, INT64 result) ---
        # mid-expression: the bitwise value feeds a comparison
        ('int_and_int_eq', num,
         [{'col': 'a'}, {'val': 4}, {'and': []}, {'val': 0.0}, {'eq': []}],
         [{'name': 'i', 'kind': 'number', 'isList': False,
           'values': [1.0, 2.0, 3.0, 4.0]},
          {'name': 'a', 'kind': 'integer', 'isList': False, 'values': [5, 2, 0, 7]}]),
        ('int_or_int_ne', num,
         [{'col': 'a'}, {'val': 2}, {'or': []}, {'ne': 3.0}],
         [{'name': 'i', 'kind': 'number', 'isList': False,
           'values': [1.0, 2.0, 3.0, 4.0]},
          {'name': 'a', 'kind': 'integer', 'isList': False, 'values': [5, 2, 1, 4]}]),
        # self & self (two stacked col loads)
        ('int_and_self_ge', num,
         [{'col': 'a'}, {'col': 'a'}, {'and': []}, {'ge': 3.0}], icol3),
        # int64-preserving derivation: (a+1) & 1 compared
        ('derived_add_and_eq', num,
         [{'col': 'a'}, {'val': 1}, {'add': []}, {'val': 1}, {'and': []},
          {'eq': 0.0}], icol3),
        # (a*2) | 4 compared
        ('derived_mul_or_eq', num,
         [{'col': 'a'}, {'val': 2}, {'mul': []}, {'val': 4}, {'or': []},
          {'eq': 4.0}], icol3),
        # (a-1) & 1 compared (int64 through SUB)
        ('derived_sub_and_ne', num,
         [{'col': 'a'}, {'val': 1}, {'sub': []}, {'val': 1}, {'and': []},
          {'ne': 1.0}], icol3),
        # (-a) | 1 compared (int64 through NEG)
        ('derived_neg_or_eq', num,
         [{'col': 'a'}, {'neg': []}, {'val': 1}, {'or': []}, {'eq': 1.0}], icol3),
        # (a % 7) & 1: int64 through the literal-divisor MOD path
        ('derived_mod_and_eq', num,
         [{'col': 'a'}, {'val': 7}, {'mod': []}, {'val': 1}, {'and': []},
          {'eq': 1.0}], icol3),
        # RAW int64 verdict, all rows nonzero: reference passes silently
        ('int_or_verdict_all_nonzero', num,
         [{'col': 'a'}, {'val': 2}, {'or': []}],
         [{'name': 'i', 'kind': 'number', 'isList': False,
           'values': [1.0, 2.0, 3.0]},
          {'name': 'a', 'kind': 'integer', 'isList': False, 'values': [5, 0, 4]}]),
        # RAW int64 verdict with a zero row: reference KeyError crash
        ('int_and_verdict_zero_crash', num,
         [{'col': 'a'}, {'val': 4}, {'and': []}],
         [{'name': 'i', 'kind': 'number', 'isList': False,
           'values': [1.0, 2.0, 3.0]},
          {'name': 'a', 'kind': 'integer', 'isList': False, 'values': [5, 2, 4]}]),
        # int64 - bool stays int64 ("4" via cast-str)
        ('int_sub_bool_cast_str', num,
         [{'col': 'a'}, {'sub': True}, {'cast': 'str'}, {'eq': '4'}],
         [{'name': 'i', 'kind': 'number', 'isList': False, 'values': [1.0, 2.0]},
          {'name': 'a', 'kind': 'integer', 'isList': False, 'values': [5, 4]}]),
        # pandas __neg__ on a bool series is LOGICAL NOT (bool dtype):
        # -True == False == 0, and the bool result compares as 1/0
        ('neg_bool_eq', boole,
         [{'col': 'f'}, {'neg': []}, {'eq': 0.0}], fcol),
        ('neg_bool_eq_one', boole,
         [{'col': 'f'}, {'neg': []}, {'eq': 1.0}], fcol),
        # bool - bool: numpy boolean-subtract TypeError (crash class)
        ('bool_sub_bool_crash', boole,
         [{'col': 'f'}, {'val': True}, {'sub': []}, {'eq': 0.0}], fcol),
        # float & int literal: TypeError (crash class — stays vacuous here)
        ('float_and_int_crash', num,
         [{'col': 'a'}, {'val': 4}, {'and': []}], numcol([5.0, 2.0, 0.0])),
        # bool dividends are ints through MOD too: bool % 3 -> int64, and
        # the bitwise dispatch applies downstream ((f%3)&1)
        ('bool_mod_int_and', boole,
         [{'col': 'f'}, {'mod': 3}, {'val': 1}, {'and': []}, {'eq': 0.0}], fcol),
        # bool % False = numpy integer mod-by-zero: 0 int64 ("0" cast-str),
        # NOT the numeric-zero NaN fold
        ('bool_mod_false_cast', boole,
         [{'col': 'f'}, {'mod': False}, {'cast': 'str'}, {'eq': '0'}], fcol),
    ]


def run_probes(out_path):
    blocks = []
    n_crash = 0
    for name, edges, expr, columns in probe_cases():
        artifact = {'models': {'M': {'indexes': [['i']], 'edges': edges,
                    'assertions': [{'msg': name, 'expr': expr}]}}}
        ref = run_reference(artifact, columns)
        if ref['crash']:
            n_crash += 1
        blocks.append({
            'feature': 'runtime-fuzz-probes',
            'artifactInline': artifact,
            'model': 'M',
            'tests': [{
                'test': f'probe {name}',
                'model': 'M',
                'columns': columns,
                'goldenViolations': ref['goldenViolations'],
                'survivorCount': ref['survivorCount'],
                'aborted': ref['aborted'],
                **({'crash': ref['crash']} if ref['crash'] else {}),
            }],
        })
    with open(out_path, 'w') as f:
        json.dump(blocks, f, indent=1)
    print(f'wrote {len(blocks)} probe cases to {out_path} ({n_crash} reference crashes)')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('cmd', choices=['gen', 'probes'])
    ap.add_argument('out')
    ap.add_argument('--n', type=int, default=300)
    ap.add_argument('--seed', type=int, default=5001)
    args = ap.parse_args()

    if args.cmd == 'probes':
        run_probes(args.out)
        return

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
