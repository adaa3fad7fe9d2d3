"""Pure-Column expression builders.

Everything here returns ``pyspark.sql.Column`` built only from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python
in the executor hot path. This is the engine's answer to the
reference's four inline UDF-ish stages (parse/OCR/chunk/embed,
``streamlit_app.py:60-94``): wherever the semantics are expressible as
relational expressions, we express them so Catalyst can optimize.
"""

from .vector import cosine, dot, l2_norm, l2_normalize  # noqa: F401
from .hashing import md5_int, hash_components, minhash_signature  # noqa: F401
from .text import token_count, punct_ratio, stopword_hits  # noqa: F401
