"""Test harnesses that are product surface in their own right (the
reference ships its REST conformance runner as a first-class tool,
``rest-api-tests/run_tests.py``)."""
