"""Pure-Python reference semantics: the oracle for tests AND the
kernels executed inside the Spark pandas UDFs. No Spark imports here.
"""
