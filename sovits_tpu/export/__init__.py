"""ONNX emission for MoeSS-ecosystem consumers (self-contained protobuf
writer + graph builder + numpy verification runtime; see onnx_proto.py)."""
