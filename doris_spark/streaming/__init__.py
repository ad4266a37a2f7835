"""Structured Streaming layer — the reference's continuous-ingest surface
re-expressed as readStream → transform → writeStream plans (SURVEY §2.11).
"""
