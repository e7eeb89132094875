"""Minimal ONNX (protobuf) reader.

We only need to extract named initializer tensors and a handful of constant
values from the bundled Silero VAD graph — pulling in a full onnx/
onnxruntime dependency for that would defeat the point of a hermetic
TPU-native stack (the reference instead ships onnxruntime as dependency L0b,
reference: faster_whisper/vad.py:296-314).  This implements just enough of
the protobuf wire format to walk ModelProto -> GraphProto -> TensorProto.
"""

from typing import Dict, List, Tuple

import numpy as np

_ONNX_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    6: np.int32,
    7: np.int64,
    10: np.float16,
    11: np.float64,
}


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes) -> List[Tuple[int, int, object]]:
    out = []
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        out.append((fno, wt, v))
    return out


def _tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    """TensorProto fields: 1=dims 2=data_type 8=name 9=raw_data
    (4=float_data, 7=int64_data as fallbacks)."""
    dims, dtype_code, name, raw = [], None, "", None
    floats, int64s = [], []
    for fno, wt, v in _fields(buf):
        if fno == 1 and wt == 0:
            dims.append(v)
        elif fno == 2 and wt == 0:
            dtype_code = v
        elif fno == 8:
            name = v.decode("utf-8")
        elif fno == 9:
            raw = v
        elif fno == 4:
            floats.append(v)
        elif fno == 7:
            int64s.append(v)
    dtype = _ONNX_DTYPES.get(dtype_code)
    if dtype is None:
        raise ValueError(f"unsupported ONNX tensor dtype {dtype_code} for {name!r}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)
    elif floats:
        arr = np.array(
            [np.frombuffer(f, "<f4")[0] if isinstance(f, bytes) else f for f in floats],
            dtype=np.float32,
        )
    elif int64s:
        arr = np.array(int64s, dtype=np.int64)
    else:
        arr = np.zeros(0, dtype=dtype)
    return name, arr.reshape(dims) if dims else arr.reshape(())


def read_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """Return {name: array} for every initializer in the model's graph."""
    with open(path, "rb") as f:
        data = f.read()
    graphs = [v for fno, wt, v in _fields(data) if fno == 7 and wt == 2]
    if not graphs:
        raise ValueError(f"{path} does not look like an ONNX ModelProto")
    out: Dict[str, np.ndarray] = {}
    for fno, wt, v in _fields(graphs[0]):
        if fno == 5 and wt == 2:  # initializer
            name, arr = _tensor(v)
            out[name] = arr
    return out


def _attribute(buf: bytes):
    """AttributeProto: 1=name 2=f(no; f is 2? see below) — field numbers per
    onnx.proto3: 1=name, 2=f? NO: 2 is unused; actual: 1=name, 20=type,
    2=f(float,wt5), 3=i(int64,wt0), 4=s(bytes), 5=t(tensor), 7=floats,
    8=ints, 9=strings."""
    name, val = "", None
    ints: List[int] = []
    floats: List[float] = []
    for fno, wt, v in _fields(buf):
        if fno == 1:
            name = v.decode("utf-8")
        elif fno == 2 and wt == 5:
            val = np.frombuffer(v, "<f4")[0]
        elif fno == 3 and wt == 0:
            # int64 varints are two's-complement encoded
            val = v - (1 << 64) if v >= (1 << 63) else v
        elif fno == 4 and wt == 2:
            val = v.decode("utf-8", errors="replace")
        elif fno == 5 and wt == 2:
            val = _tensor(v)[1]
        elif fno == 7:
            floats.append(np.frombuffer(v, "<f4")[0] if isinstance(v, bytes) else v)
        elif fno == 8 and wt == 0:
            ints.append(v - (1 << 64) if v >= (1 << 63) else v)
    if ints:
        val = ints
    elif floats:
        val = floats
    return name, val


class OnnxNode:
    """One graph node: op_type, input/output names, attribute dict."""

    __slots__ = ("op_type", "name", "inputs", "outputs", "attrs")

    def __init__(self, op_type, name, inputs, outputs, attrs):
        self.op_type = op_type
        self.name = name
        self.inputs = inputs
        self.outputs = outputs
        self.attrs = attrs

    def __repr__(self):
        return f"OnnxNode({self.op_type}, in={self.inputs}, out={self.outputs})"


def _node(buf: bytes) -> OnnxNode:
    """NodeProto: 1=input(rep) 2=output(rep) 3=name 4=op_type 5=attribute."""
    ins, outs, name, op = [], [], "", ""
    attrs = {}
    for fno, wt, v in _fields(buf):
        if fno == 1:
            ins.append(v.decode("utf-8"))
        elif fno == 2:
            outs.append(v.decode("utf-8"))
        elif fno == 3:
            name = v.decode("utf-8")
        elif fno == 4:
            op = v.decode("utf-8")
        elif fno == 5:
            aname, aval = _attribute(v)
            attrs[aname] = aval
    return OnnxNode(op, name, ins, outs, attrs)


def _value_info_name(buf: bytes) -> str:
    for fno, wt, v in _fields(buf):
        if fno == 1:
            return v.decode("utf-8")
    return ""


def read_onnx_graph(path: str):
    """Full graph walk: (nodes, initializers, input_names, output_names).

    Used by the test-suite's numpy reference evaluator to execute the
    bundled Silero graph independently of the hand-written JAX port
    (tests/test_vad.py), standing in for onnxruntime golden probs in
    hermetic environments (reference runtime: faster_whisper/vad.py:296-314).
    """
    with open(path, "rb") as f:
        data = f.read()
    graphs = [v for fno, wt, v in _fields(data) if fno == 7 and wt == 2]
    if not graphs:
        raise ValueError(f"{path} does not look like an ONNX ModelProto")
    nodes, inits, in_names, out_names = [], {}, [], []
    for fno, wt, v in _fields(graphs[0]):
        if fno == 1 and wt == 2:
            nodes.append(_node(v))
        elif fno == 5 and wt == 2:
            name, arr = _tensor(v)
            inits[name] = arr
        elif fno == 11 and wt == 2:
            in_names.append(_value_info_name(v))
        elif fno == 12 and wt == 2:
            out_names.append(_value_info_name(v))
    return nodes, inits, in_names, out_names
