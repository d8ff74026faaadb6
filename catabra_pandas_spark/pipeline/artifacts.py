"""Persistence for the engine's driver-side model artifacts — the capped
count tables, merge lists, codebooks and coefficient dicts that the
training operators return (``train_ngram_lm``, ``doc_frequencies``,
``train_bpe``, ``train_quality_classifier``, ``kmeans_codebook``).

A 100 TB pipeline trains these ONCE (each costs corpus scans) and reuses
them across many scoring jobs, clusters and days; every artifact is
O(model) driver state by design, so a plain JSON file is the right
transport — no pickle (unsafe across versions/trust boundaries), no
Spark-specific format.  The codec round-trips exactly the value shapes
the operators produce and consume:

* dicts with STRING or TUPLE keys (bigram tables: ``{(w1, w2): n}``),
* tuples vs lists (BPE merges are ``(a, b)`` pairs; ``bpe_tokenize``
  looks them up by tuple),
* numpy arrays and scalars (k-means codebooks) — arrays restore with
  their dtype,
* arbitrary nesting of the above with ints/floats/strings/bools/None.

Tagging: containers JSON cannot express natively are wrapped as
``{"__t__": kind, ...}``; plain dicts that happen to carry a ``"__t__"``
key are escaped, so the encoding is injective.  Files are UTF-8 JSON
with a format header — diffable, greppable, and readable by any
language.

Paths are driver-local (``open()``): on a cluster, point at shared
storage mounted on the driver, or pass an open file object.
"""

from __future__ import annotations

import json
from typing import IO, Union

_FORMAT = "catabra-pandas-spark-artifact-v1"


def _encode(obj):
    import numpy as np

    if isinstance(obj, dict):
        if all(isinstance(k, str) for k in obj) and "__t__" not in obj:
            return {k: _encode(v) for k, v in obj.items()}
        return {"__t__": "dict",
                "items": [[_encode(k), _encode(v)]
                          for k, v in obj.items()]}
    if isinstance(obj, tuple):
        return {"__t__": "tuple", "items": [_encode(v) for v in obj]}
    if isinstance(obj, list):
        return [_encode(v) for v in obj]
    if isinstance(obj, np.ndarray):
        # numeric/bool only: object/datetime/str arrays would round-trip
        # lossily (tolist() flattens tuples, dates stringify) — fail
        # loudly instead of returning a structurally different value
        if obj.dtype.kind not in "biuf":
            raise TypeError(
                f"cannot persist ndarray of dtype {obj.dtype!r}; only "
                "bool/int/uint/float arrays round-trip exactly")
        return {"__t__": "ndarray", "dtype": str(obj.dtype),
                "shape": list(obj.shape),
                "data": obj.reshape(-1).tolist()}
    if isinstance(obj, np.generic):
        return {"__t__": "npscalar", "dtype": str(obj.dtype),
                "value": obj.item()}
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    raise TypeError(f"cannot persist artifact value of type {type(obj)!r}")


def _decode(obj):
    import numpy as np

    if isinstance(obj, dict):
        t = obj.get("__t__")
        if t is None:
            return {k: _decode(v) for k, v in obj.items()}
        if t == "dict":
            return {_decode(k): _decode(v) for k, v in obj["items"]}
        if t == "tuple":
            return tuple(_decode(v) for v in obj["items"])
        if t == "ndarray":
            return np.asarray(obj["data"], dtype=obj["dtype"]) \
                .reshape(obj["shape"])
        if t == "npscalar":
            return np.dtype(obj["dtype"]).type(obj["value"])
        raise ValueError(f"unknown artifact tag {t!r}")
    if isinstance(obj, list):
        return [_decode(v) for v in obj]
    return obj


def save_artifact(obj, path: Union[str, IO[str]]) -> None:
    """Write a training artifact as tagged JSON.  ``path`` is a file
    path or an open text file object.  Serialization happens BEFORE the
    target is opened, so an unencodable value can never truncate a
    previously valid artifact file."""
    text = json.dumps({"format": _FORMAT, "artifact": _encode(obj)})
    if hasattr(path, "write"):
        path.write(text)
    else:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)


def load_artifact(path: Union[str, IO[str]]):
    """Read an artifact written by :func:`save_artifact`; the returned
    value is structurally identical to what the training operator
    produced (tuple keys, dtypes and all)."""
    if hasattr(path, "read"):
        doc = json.load(path)
    else:
        with open(path, "r", encoding="utf-8") as fh:
            doc = json.load(fh)
    if not (isinstance(doc, dict) and doc.get("format") == _FORMAT):
        raise ValueError("not a catabra-pandas-spark artifact file")
    return _decode(doc["artifact"])
