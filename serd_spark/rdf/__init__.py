"""Pure-Python, document-scoped RDF core.

This package is the serd-equivalent grammar/serialization core
(reference surface: ``serd/serd.h`` reader/writer/env/uri/node
groups). It has NO Spark dependency: every function here operates on
one document (a string) at a time so it can run vectorized inside
Arrow batches from :mod:`serd_spark.operators.extract`.
"""

from serd_spark.rdf.model import (  # noqa: F401
    BLANK,
    IRI,
    LITERAL,
    ParseError,
    Statement,
    Term,
)
