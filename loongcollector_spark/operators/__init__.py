"""Operator library: parse / filter / enrich / aggregate / route stages.

Each module documents the reference operator it reproduces (file:line) and the
Spark primitive chosen. All stages are DataFrame→DataFrame functions; the plan
stays declarative so Catalyst prunes, pushes, and codegens across stage
boundaries.
"""
