#!/usr/bin/env python3
"""Cross-implementation validation of the LOPQ model interchange format.

The engine exports models in the reference's protobuf schema
(com.flickr.vision.lopq.LOPQModelParams — see LopqProto.scala, which
hand-encodes the proto2 wire format). This script is the OTHER side of
that interchange, in Python like the reference, with NO protobuf
dependency: a from-scratch proto2 wire reader (varints + length-delimited
blocks), followed by an independent numpy re-implementation of the
reference's predict math (split → coarse argmin → residual − C − mu →
R·r → per-subvector fine argmin, lopq/lopq/model.py predict/project).

Validation levels:
  1. WIRE: model.pb parses with an independent parser; field numbers and
     counts match the schema (2 Cs, 2V Rs, 2V mus, M subs).
  2. SHAPE: every matrix/vector has the dimensions the schema implies
     from (D, V, M, S).
  3. SEMANTICS: for a sample of corpus vectors (read from the testdata
     parquet with pyarrow), the numpy predict reproduces the codes the
     Scala engine wrote to the index — coarse0, coarse1, and all M fine
     codes, exactly.

Usage: python3 scripts/check_proto.py [indexDir] [embeddingsParquet] [nSample]
Defaults: target/graft-index/sf0.01  /root/testdata/sf0.01/embeddings.parquet  200
"""
import glob
import os
import struct
import sys

import numpy as np
import pyarrow.parquet as pq


# ---------------------------------------------------------------- wire

def read_varint(b, pos):
    shift = 0
    out = 0
    while True:
        byte = b[pos]
        pos += 1
        out |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return out, pos
        shift += 7


def iter_fields(b):
    """Yield (field_number, wire_type, value) over one message's bytes."""
    pos = 0
    while pos < len(b):
        key, pos = read_varint(b, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = read_varint(b, pos)
        elif wire == 2:
            n, pos = read_varint(b, pos)
            v = b[pos:pos + n]
            pos += n
        elif wire == 5:
            v = b[pos:pos + 4]
            pos += 4
        elif wire == 1:
            v = b[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def parse_floats(payload):
    return np.frombuffer(payload, dtype="<f4")


def parse_matrix(b):
    values, shape = None, []
    for field, wire, v in iter_fields(b):
        if field == 1:
            values = parse_floats(v)
        elif field == 2:
            shape.append(v)
    if shape:
        assert len(shape) == 2, f"matrix shape rank {len(shape)}"
        values = values.reshape(shape[0], shape[1])
    return values


def parse_model(b):
    m = {"Cs": [], "Rs": [], "mus": [], "subs": []}
    for field, wire, v in iter_fields(b):
        if field == 1:
            m["D"] = v
        elif field == 2:
            m["V"] = v
        elif field == 3:
            m["M"] = v
        elif field == 4:
            m["S"] = v
        elif field == 5:
            m["Cs"].append(parse_matrix(v))
        elif field == 6:
            m["Rs"].append(parse_matrix(v))
        elif field == 7:
            m["mus"].append(parse_matrix(v))  # Vector: no shape field
        elif field == 8:
            m["subs"].append(parse_matrix(v))
        else:
            raise ValueError(f"unexpected field {field}")
    return m


# ------------------------------------------------------------ semantics

def predict(model, x):
    """The reference's predict math, independently in numpy.

    Mirrors model.py predict/project: halves, coarse argmin on squared
    L2, residual minus centroid minus mu, rotate, per-subvector argmin.
    Arithmetic shadows the engine: subtraction in float32, the mat-vec
    accumulated in float64 then cast back to float32.
    """
    D, V, M = model["D"], model["V"], model["M"]
    half = D // 2
    fine_splits = M // 2
    sub_dim = D // M
    halves = [x[:half], x[half:]]
    coarse = []
    fine = []
    for s in (0, 1):
        h = halves[s]
        C = model["Cs"][s]
        d = ((C.astype(np.float64) - h.astype(np.float64)) ** 2).sum(axis=1)
        c = int(np.argmin(d))
        coarse.append(c)
        r = (h - C[c]) - model["mus"][s * V + c]          # float32, like VectorOps.subtract
        R = model["Rs"][s * V + c]
        px = (R.astype(np.float64) @ r.astype(np.float64)).astype(np.float32)
        for f in range(fine_splits):
            sub = px[f * sub_dim:(f + 1) * sub_dim]
            SC = model["subs"][s * fine_splits + f]
            ds = ((SC.astype(np.float64) - sub.astype(np.float64)) ** 2).sum(axis=1)
            fine.append(int(np.argmin(ds)))
    return coarse[0], coarse[1], fine


def main():
    index_dir = sys.argv[1] if len(sys.argv) > 1 else "target/graft-index/sf0.01"
    emb_path = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01/embeddings.parquet"
    n_sample = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    with open(os.path.join(index_dir, "model.pb"), "rb") as f:
        raw = f.read()
    m = parse_model(raw)
    D, V, M, S = m["D"], m["V"], m["M"], m["S"]
    print(f"[check-proto] wire: parsed {len(raw)} bytes -> D={D} V={V} M={M} S={S}")

    # ---- structural/shape checks
    half, sub_dim = D // 2, D // M
    assert len(m["Cs"]) == 2 and all(c.shape == (V, half) for c in m["Cs"]), "Cs shape"
    assert len(m["Rs"]) == 2 * V and all(r.shape == (half, half) for r in m["Rs"]), "Rs shape"
    assert len(m["mus"]) == 2 * V and all(mu.shape == (half,) for mu in m["mus"]), "mus shape"
    assert len(m["subs"]) == M and all(sq.shape == (S, sub_dim) for sq in m["subs"]), "subs shape"
    print(f"[check-proto] shape: 2 Cs ({V}x{half}), {2*V} Rs ({half}x{half}), "
          f"{2*V} mus ({half}), {M} subs ({S}x{sub_dim}) — all as the schema implies")

    # ---- semantic check vs the engine's own codes
    emb = pq.read_table(emb_path).to_pydict()
    vecs = {vid: np.array(e, dtype=np.float32)
            for vid, e in zip(emb["vec_id"], emb["embedding"])}
    raw_dim = len(next(iter(vecs.values())))
    if raw_dim != D:
        # a PCA-fronted index: the proto schema predates PCA (reference
        # included), so model.pb holds the POST-projection quantizer and
        # the raw vectors cannot be pushed through it directly — the wire
        # and shape levels above are the full interchange check there
        print(f"[check-proto] semantics: skipped — raw dim {raw_dim} != model "
              f"D={D} (PCA-fronted index; the proto schema predates PCA)")
        sys.exit(0)
    codes = {}
    for f in glob.glob(os.path.join(index_dir, "codes", "**", "*.parquet"),
                       recursive=True):
        t = pq.read_table(f).to_pydict()
        for i, rid in enumerate(t["id"]):
            codes[rid] = (t["coarse0"][i], t["coarse1"][i], list(t["fine"][i]))
    ids = sorted(codes)[:: max(1, len(codes) // n_sample)][:n_sample]
    bad = 0
    for rid in ids:
        c0, c1, fine = predict(m, vecs[rid])
        ec0, ec1, efine = codes[rid]
        if (c0, c1, fine) != (ec0, ec1, list(efine)):
            bad += 1
            if bad <= 3:
                print(f"[check-proto]   MISMATCH id={rid}: numpy=({c0},{c1},{fine}) "
                      f"engine=({ec0},{ec1},{list(efine)})")
    status = "PASS" if bad == 0 else "FAIL"
    print(f"[check-proto] semantics: {len(ids) - bad}/{len(ids)} sampled codes "
          f"reproduced exactly by the independent numpy predict — {status}")
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main()
