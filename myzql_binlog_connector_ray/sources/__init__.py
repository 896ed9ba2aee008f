"""Live sources: MySQL wire-protocol client + binlog tailer.

The Ray engine is file-segment-based (segments are the unit of
parallel decode); these sources close the loop to a live server the
way a real deployment would: one lightweight tailer per MySQL server
speaks the replication protocol and writes self-contained segment
files to (shared) storage, which the Ray Data pipelines then consume.
"""
