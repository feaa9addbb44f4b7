"""Summarize a jax.profiler trace into a per-stage table.

Consumes the Chrome-format `*.trace.json.gz` that `--profile` writes under
`<run_dir>/profile/plugins/profile/<ts>/` and aggregates device-op durations
by the `jax.named_scope` tags the model emits (pyramid/knn_l*/subsample_l*/
kpconv_backbone/cross_encoder/matching/losses) — the TPU replacement for the
reference's manual stage timers (qk_regtr_full.py:150-290).

Trace events name HLO fusions (`hlo_op`), not source scopes; the scope lives
in HLO metadata. Pass an `--hlo-dir` produced with
`XLA_FLAGS=--xla_dump_to=<dir>` (any *.txt HLO dumps) to join them; without
it, events whose args already carry a scope path (some backends emit
`tf_op`/`long_name`) are still aggregated.

Usage:
    python -m superpoints_registration_tpu.utils.trace_summary \
        <trace.json.gz> [--hlo-dir <xla_dump_dir>] [--module jit_train_step]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re

# Most-specific first: the inner pyramid scopes (knn_l*, pools_l*, ...)
# must win over the enclosing 'pyramid'.
STAGES = ['knn_l0', 'knn_l1', 'knn_l2', 'knn_l3', 'subsample_l',
          'pools_l', 'upsamples_l', 'pyramid', 'kpconv_backbone', 'pos_embed',
          'cross_encoder', 'overlap_head', 'matching', 'losses']


def _scope_of(op_name: str):
    for s in STAGES:
        if f'/{s}' in op_name or op_name.startswith(s):
            return s
    return None


def build_hlo_scope_map(hlo_dir: str, module: str | None = None) -> dict:
    """instruction/fusion name -> deepest matching stage scope, from
    `metadata={... op_name="jit(train_step)/.../cross_encoder/..." ...}`
    annotations in XLA HLO text dumps."""
    mapping = {}
    pat = re.compile(r'%([\w.\-]+) = .*metadata={[^}]*op_name="([^"]+)"')
    for path in sorted(glob.glob(os.path.join(hlo_dir, '*.txt'))):
        if module and module not in os.path.basename(path):
            continue
        current_fusion = None
        fusion_votes: dict = {}
        for line in open(path):
            m = pat.search(line)
            if not m:
                # Track which fused computation we are inside.
                cm = re.match(r'%?([\w.\-]+) \([^)]*\) -> ', line.strip())
                if cm:
                    current_fusion = cm.group(1)
                continue
            name, op_name = m.groups()
            scope = _scope_of(op_name)
            if scope:
                mapping.setdefault(name, scope)
                if current_fusion:
                    # Vote: a fused computation inherits its members' scope.
                    v = fusion_votes.setdefault(current_fusion, collections.Counter())
                    v[scope] += 1
        for comp, votes in fusion_votes.items():
            # fused_computation.N hosts fusion.N (and .clone variants).
            target = comp.replace('fused_computation', 'fusion')
            mapping.setdefault(target, votes.most_common(1)[0][0])
    return mapping


def summarize(path, hlo_dir: str | None = None, module: str | None = None,
              top_n: int = 15) -> str:
    opener = gzip.open if str(path).endswith('.gz') else open
    with opener(path, 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    hlo_map = build_hlo_scope_map(hlo_dir, module) if hlo_dir else {}

    by_scope = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        args = e.get('args') or {}
        name = e.get('name', '')
        hlo_op = args.get('hlo_op', name)
        scope = None
        for cand in (args.get('tf_op'), args.get('long_name'), name):
            if isinstance(cand, str):
                scope = _scope_of(cand)
                if scope:
                    break
        if scope is None and hlo_op in hlo_map:
            scope = hlo_map[hlo_op]
        if scope is None and isinstance(hlo_op, str):
            # strip .clone/.remat suffixes
            base = re.sub(r'(\.clone|\.remat\d*)+$', '', hlo_op)
            scope = hlo_map.get(base)
        if scope is None:
            continue
        dur = float(e['dur'])
        total += dur
        by_scope[scope] += dur
        by_name[f'{scope}:{hlo_op.split(".")[0]}'] += dur

    rows = sorted(by_scope.items(), key=lambda kv: -kv[1])
    lines = ['| stage | ms | share |', '|---|---|---|']
    for k, v in rows:
        lines.append(f'| {k} | {v / 1e3:.2f} | {v / max(total, 1e-9):.1%} |')
    lines.append(f'| **total tagged** | {total / 1e3:.2f} | |')
    lines.append('')
    lines.append('Top ops:')
    for k, v in by_name.most_common(top_n):
        lines.append(f'- {k}: {v / 1e3:.2f} ms')
    return '\n'.join(lines)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('trace')
    p.add_argument('--hlo-dir', default=None)
    p.add_argument('--module', default=None)
    p.add_argument('--top', type=int, default=15)
    args = p.parse_args(argv)
    print(summarize(args.trace, args.hlo_dir, args.module, args.top))


if __name__ == '__main__':
    main()
