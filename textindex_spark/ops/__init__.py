"""Training-data pipeline operators (dedup, similarity, text
analysis, multimodal plumbing) — the operations a 100 TB web-text
training pipeline needs beyond the reference's own surface.

All operators are built from JVM-side DataFrame functions (md5/conv,
higher-order array functions, groupBy/join); Python appears only in
ops that are inherently kernel-shaped (multimodal decode stubs).
Every hash used for dedup/similarity is the *portable* 60-bit prefix
of md5 so a DuckDB oracle can reproduce results bit-for-bit.
"""
