"""Core domain pipeline: embed, ingest, search, filters, metadata.

TPU-native replacement for the reference's L2 layer
(/root/reference/backend/app/main.py:550-1243).
"""
