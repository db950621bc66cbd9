"""Error taxonomy mirroring the reference's ``JvmFunctionError``
(reference: src/lib.rs:11-25) — compile error / unknown class / runtime
exception / unsupported type — surfaced as Python exceptions at DDL time.

Runtime UDF exceptions propagate natively through Spark as
``PythonException`` and fail the query (reference parity:
src/jvm.rs:210-214 fails the whole query on the first row error).
"""


class AdhesiveError(Exception):
    """Base class for all adhesive_spark errors."""


class DdlParseError(AdhesiveError):
    """The ``CREATE FUNCTION`` statement could not be parsed."""


class CompileError(AdhesiveError):
    """The function body failed to compile.

    Mirrors ``InstantiationException("Can't compile function")`` with
    compiler diagnostics attached (reference: java/.../Compiler.java:46-52).
    """


class UnknownFunctionError(AdhesiveError):
    """``LANGUAGE MODULE``/``CLASS`` path does not resolve.

    Mirrors the unknown-class failure (reference: src/jvm.rs:63-109,
    tested at src/jvm.rs:303-314).
    """


class UnsupportedTypeError(AdhesiveError):
    """A declared SQL type has no Spark mapping.

    Mirrors ``exec_err!("type not supported (to be added)")``
    (reference: src/fusion.rs:83-90) — though our matrix is far wider.
    """
