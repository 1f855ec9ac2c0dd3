#!/usr/bin/env python3
"""Read routing.bin sidecars and print candidate separability statistics.

Calibration scratch tool for the round-10 separability-aware auto routing:
compares clustered vs random fixtures to pick the routable threshold.
"""
import struct, sys, math, glob

def read_routing(path):
    with open(path, 'rb') as f:
        data = f.read()
    off = 0
    magic, ver = struct.unpack_from('>ii', data, off); off += 8
    assert magic == 0x47525447, hex(magic)
    # readUTF: 2-byte length + bytes
    (mlen,) = struct.unpack_from('>H', data, off); off += 2
    metric = data[off:off+mlen].decode(); off += mlen
    dims, n = struct.unpack_from('>ii', data, off); off += 8
    ents = []
    for _ in range(n):
        pid, = struct.unpack_from('>i', data, off); off += 4
        rad, = struct.unpack_from('>d', data, off); off += 8
        c = struct.unpack_from('>%df' % dims, data, off); off += 4*dims
        ents.append((pid, rad, c))
    return metric, dims, ents

def l2(a, b):
    return math.sqrt(sum((x-y)*(x-y) for x, y in zip(a, b)))

def stats(path):
    metric, dims, ents = read_routing(path)
    rads = [e[1] for e in ents]
    cents = [e[2] for e in ents]
    n = len(ents)
    nearest = []
    for i in range(n):
        dmin = min(l2(cents[i], cents[j]) for j in range(n) if j != i)
        nearest.append(dmin)
    mean_rad = sum(rads)/n
    mean_near = sum(nearest)/n
    # candidate stats
    ratio_mean = mean_rad / mean_near if mean_near > 0 else float('inf')
    per = [rads[i]/nearest[i] if nearest[i] > 0 else float('inf') for i in range(n)]
    # overlap fraction: pairs whose covering balls intersect
    pairs = 0; overl = 0
    for i in range(n):
        for j in range(i+1, n):
            pairs += 1
            if l2(cents[i], cents[j]) < rads[i] + rads[j]:
                overl += 1
    print(f"{path}")
    print(f"  metric={metric} dims={dims} G={n}")
    print(f"  mean_rad={mean_rad:.4f} mean_nearest_centroid={mean_near:.4f} ratio={ratio_mean:.4f}")
    print(f"  per-graph rad/nearest: min={min(per):.3f} max={max(per):.3f} mean={sum(per)/n:.3f}")
    print(f"  ball-overlap pair fraction: {overl}/{pairs} = {overl/pairs if pairs else 0:.3f}")

if __name__ == '__main__':
    for p in sys.argv[1:]:
        for f in glob.glob(p):
            stats(f)
