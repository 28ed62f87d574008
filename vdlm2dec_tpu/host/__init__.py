"""Host-side application layer (L5): AVLC parse, ACARS/XID decode, outputs.

Irregular byte/text processing with tiny data volumes — deliberately kept on
the host CPU (SURVEY.md section 7.1 stage 5); the TPU path ends at
RS-corrected frames.
"""
