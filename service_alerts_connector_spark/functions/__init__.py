"""Scalar function library — every reference scalar (SURVEY §2.7 F1-F20)
expressed as a Catalyst Column expression.  Zero Python UDFs live here: these
all compile into whole-stage-codegen'd JVM expressions, which is what lets the
same transform chain run unchanged over 100 TB.
"""
