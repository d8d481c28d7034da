"""Operators: each module re-expresses one stage of the reference pipeline
(or a north-rule extension) as composable DataFrame transformations."""
