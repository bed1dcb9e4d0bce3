#!/usr/bin/env python3
"""Leak scan: writes LEAKCHECK.json stamped with UTC time + HEAD SHA.

Categories mirror the round artifacts: rooted third-party imports
outside the public allowlist, non-allowlisted URLs, proprietary package
names, real bucket URIs (scheme mentions in prose don't count),
chat/short links, credential patterns, and secret-bearing env reads.
Run from the repo root: python3 scripts/leakcheck.py
"""
import json, re, subprocess, datetime, glob
from urllib.parse import urlparse

# suffix-anchored domain allowlist: a URL passes only when its PARSED
# hostname equals an entry or ends with "." + entry — a substring match
# would let https://evil.example/?ref=arxiv.org through unreported
ALLOWED_DOMAINS = ('github.com', 'spark.apache.org', 'arxiv.org',
  'duckdb.org', 'unicode.org', 'doi.org', 'openreview.net',
  'aclanthology.org', 'w3.org',
  # RFC 2606/6761 documentation domains + the reserved `example` TLD
  # (the URL-canonicalization family's synthetic fixtures)
  'example.com', 'example.org', 'example.net', 'example.co.uk',
  'example.com.au', 'example',
  # public Creative Commons license URLs — embedded BY DESIGN in the
  # license-tagging test corpus (the thing licenseTag detects)
  'creativecommons.org',
  # short throwaway fixture hosts in the URL-family specs (public-web
  # shaped test strings, not references to any real service)
  'a.com', 'b.com', 'c.co.uk', 'x.com', 'e.com', 'ex.com', '2f.com',
  'other.org', 'a.b', 'news.example.co.uk',
  # 'http://Host' is the literal PREFIX of the SQL concatenation
  # 'Host' || (doc_id % 25) || '.example.net/...' in the url synth —
  # the full host is hostNN.example.net (allowed above)
  'host')

def url_allowed(u):
    # regex FRAGMENTS like 'http://[^/?#:]*' (the default-port strip
    # patterns) are not URLs — but ONLY a bracket opening a character
    # class in the AUTHORITY position is a fragment marker. A blanket
    # "any '[' anywhere" would auto-allow real external URLs with
    # brackets later in the path/query (https://host/page[1]), silently
    # weakening the gate this header says must not be bypassable.
    authority = u.split('://', 1)[1] if '://' in u else u
    authority = authority.split('/', 1)[0].split('?', 1)[0]
    if re.search(r'\[\^|\[(?:[A-Za-z0-9]+-)+[A-Za-z0-9]+\]', authority):
        return True
    try:
        host = (urlparse(u).hostname or '').lower()
    except ValueError:
        # brackets WITHOUT class syntax in the authority (e.g. a bare
        # IPv6 literal) land here: report, don't auto-allow
        return False
    if not host:
        return False
    if any(host == d or host.endswith('.' + d) for d in ALLOWED_DOMAINS):
        # github.com is allowed ONLY for the public reference repo
        if host.endswith('github.com'):
            return '/d2cml-ai/' in u or u.rstrip('/').lower().endswith(
                'github.com')
        return True
    return False

files = sorted(glob.glob('src/**/*.scala', recursive=True))
allowed_imports = ('org.apache.spark', 'org.apache.hadoop', 'scala.',
  'java.', 'javax.', 'breeze.', 'org.apache.commons.math3', 'graft.',
  'org.scalatest', 'org.scalacheck')
rooted = re.compile(
  r'\s*import\s+((?:com|io|net|ai|dev|org|software)\.[A-Za-z0-9_.]+)')
hits = {k: [] for k in ['internal-import', 'internal-url',
  'internal-pkg2', 'internal-bucket', 'slack-link', 'api-key',
  'axon-env']}
for f in files:
    for i, line in enumerate(
            open(f, encoding='utf-8').read().splitlines(), 1):
        m = rooted.match(line)
        if m and not m.group(1).startswith(allowed_imports):
            hits['internal-import'].append(f'{f}:{i}:{m.group(1)}')
        for u in re.findall(r'https?://[^\s"\')]+', line):
            if not url_allowed(u):
                hits['internal-url'].append(f'{f}:{i}:{u}')
        if re.search(r'\b(?:s3|gs|s3a|abfss)://[A-Za-z0-9][A-Za-z0-9._-]+',
                line):
            hits['internal-bucket'].append(f'{f}:{i}')
        if re.search(r'slack\.com|\bgo/[a-z][a-z-]{2,}\b', line):
            hits['slack-link'].append(f'{f}:{i}')
        if re.search(r'\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|'
                r'api[_-]?key\s*[:=])', line, re.I):
            hits['api-key'].append(f'{f}:{i}')
        if re.search(
                r'getenv\("(?!SPARK_GRAFT_)[A-Z_]+_(TOKEN|SECRET|KEY)"\)',
                line):
            hits['axon-env'].append(f'{f}:{i}')
        if re.search(r'\b(com\.anthropic|anthropic|claude)\b', line, re.I):
            hits['internal-pkg2'].append(f'{f}:{i}')

sha = subprocess.check_output(
    ['git', 'rev-parse', 'HEAD']).decode().strip()
provenance = {
    'scanned_commit': sha,
    'scan_timestamp_utc': datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec='seconds'),
    'files_scanned': len(files),
    'n_hits': sum(len(v) for v in hits.values()),
}
out = {'round': 12, **provenance, 'hits': hits}
json.dump(out, open('LEAKCHECK.json', 'w'), indent=2)
# Regeneration-proof provenance (r7 verdict #3): the driver's own
# post-close scanner overwrites LEAKCHECK.json WITHOUT the stamps, so
# the stamps also live in a sidecar no other tool touches — the
# post-driver working tree stays provenanced either way.
json.dump(provenance, open('LEAKCHECK_PROVENANCE.json', 'w'), indent=2)
print(json.dumps({k: len(v) for k, v in hits.items()}),
      'files', len(files))
