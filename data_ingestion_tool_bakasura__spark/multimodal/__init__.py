"""Multimodal columns + raw-document extraction (SURVEY §2.A4-A9, C15).

`extract` — the binaryFile -> pages -> tagged text pipeline: the
Spark-first form of the reference's per-page PyMuPDF/OCR loop
(`embedding_utils.py:123-173`), with pluggable extraction/OCR providers
(deterministic stubs by default; real PyMuPDF/vision libs are not in
this container and are gated behind import-tries).

`media` — opaque binary image/audio/video columns with typed metadata
and decode/resize/frame-sample operators as Arrow-batched pandas UDFs;
the decode step for real codecs is stubbed (`NotImplementedError`) but
the Spark-side plumbing (schemas, batching, partitioning) is real and
tested, per the round brief.
"""
