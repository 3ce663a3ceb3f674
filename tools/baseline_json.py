#!/usr/bin/env python3
"""Regenerate BASELINE_QUERIES.json from BASELINE.md's AUTHORITATIVE
per-query table (the LAST '(— AUTHORITATIVE)' heading) plus any
'Post-...-CLOSE additions' rows after it. Run after recording a new
CLOSE table so graders and the bench tooling can diff one file:

    python3 tools/baseline_json.py
"""
import json, re, sys

lines = open('BASELINE.md').read().splitlines()
starts = [i for i, l in enumerate(lines)
          if l.startswith('###') and 'AUTHORITATIVE' in l]
if not starts:
    sys.exit('no AUTHORITATIVE table heading found in BASELINE.md')
start = starts[-1]
label = re.sub(r'[^a-z0-9]+', '_',
               lines[start].lstrip('#').strip().lower())[:40].strip('_')
rows, src = {}, label
for l in lines[start:]:
    if 'CLOSE additions' in l:
        src = label + '_post'
    m = re.match(r'\| `([a-z0-9_]+)` \| ([0-9.]+) \| ([0-9.]+) \|', l)
    if m:
        rows[m.group(1)] = {'median_s': float(m.group(2)),
                            'min_s': float(m.group(3)), 'source': src}
out = {'note': 'Authoritative per-query baseline medians (sf0.1, local[32], '
               'reps=3). Generated from BASELINE.md by tools/baseline_json.py; '
               'regenerate whenever a new CLOSE table is recorded.',
       'sf': 0.1, 'queries': rows}
json.dump(out, open('BASELINE_QUERIES.json', 'w'), indent=1, sort_keys=True)
print(f'{len(rows)} queries from "{lines[start].strip()}"')
