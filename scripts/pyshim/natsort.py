# minimal natsort shim: split digit runs and compare (int, str) chunk-wise —
# the standard natural-sort definition index_natsorted relies on
import re

def _key(s):
    s = "" if s is None else str(s)
    return [int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", s)]

def natsorted(seq, key=None):
    kf = (lambda x: _key(key(x))) if key else _key
    return sorted(seq, key=kf)

def index_natsorted(seq, key=None):
    kf = (lambda i: _key(key(seq[i]))) if key else (lambda i: _key(seq[i]))
    return sorted(range(len(seq)), key=kf)

def natsort_keygen(key=None):
    return (lambda x: _key(key(x))) if key else _key
