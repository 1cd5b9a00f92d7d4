"""Packaged mirror of /native (preprocess.cc + Makefile) so pip-installed
wheels carry the kernel source; data/native.py builds it with g++ on first
use. tests/test_native_jpeg.py pins this mirror byte-identical to the
canonical /native copy."""
