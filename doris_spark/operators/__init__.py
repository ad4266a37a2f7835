"""Custom relational operators the reference supports but Spark lacks natively.

Each module implements one operator family as a composition of DataFrame ops
(preferred — stays in whole-stage codegen) or Arrow-batched pandas UDFs where
semantics require imperative logic. Reference citations in each docstring.
"""
