"""Scalar function layer: templates, macros, template functions.

The reference's template engine + 168 macros + $(...) template functions
(reference lib/template/, lib/template/macros.c:50-231,
modules/basicfuncs/basic-funcs.c:73-151) re-expressed as vectorized
column operations producing pandas Series over Arrow batches.
"""
