"""TPU test conftest.

Run with: VIDSEG_TESTS_TPU=1 python -m pytest tests/tpu -q
(the parent conftest sees that flag and leaves the platform alone; without
it these tests are collected but skip on the CPU backend).
"""
