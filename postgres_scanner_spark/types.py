"""Postgres type system → Spark DataType mapping.

Parity with the reference's OID map (reference:
src/include/postgres_type_oids.hpp, src/postgres_utils.cpp
PostgresUtils::TypeToLogicalType). Arrays map to ArrayType, composite
types to StructType, numeric to DecimalType (or double when
precision/scale unknown — same fallback the reference uses), and
exotic types (uuid/json/range/inet/money/bit) to StringType, matching
the reference's varchar fallback. `pg_array_as_varchar` flattens
arrays to their text form (reference: postgres_extension.cpp:171).
"""

from __future__ import annotations

from pyspark.sql import types as T

from .settings import SETTINGS

# OIDs from reference: src/include/postgres_type_oids.hpp
BOOLOID = 16
BYTEAOID = 17
CHAROID = 18
NAMEOID = 19
INT8OID = 20
INT2OID = 21
INT4OID = 23
TEXTOID = 25
OIDOID = 26
TIDOID = 27
JSONOID = 114
XMLOID = 142
POINTOID = 600
LSEGOID = 601
PATHOID = 602
BOXOID = 603
POLYGONOID = 604
LINEOID = 628
CIRCLEOID = 718
FLOAT4OID = 700
FLOAT8OID = 701
MONEYOID = 790
MACADDROID = 829
INETOID = 869
CIDROID = 650
BPCHAROID = 1042
VARCHAROID = 1043
DATEOID = 1082
TIMEOID = 1083
TIMESTAMPOID = 1114
TIMESTAMPTZOID = 1184
INTERVALOID = 1186
TIMETZOID = 1266
BITOID = 1560
VARBITOID = 1562
NUMERICOID = 1700
UUIDOID = 2950
JSONBOID = 3802
# range types (reference: postgres_utils.cpp maps every range to
# varchar text form; test/sql/scanner/daterange_array.test reads a
# daterange ARRAY). OIDs from pg_type.dat.
INT4RANGEOID = 3904
NUMRANGEOID = 3906
TSRANGEOID = 3908
TSTZRANGEOID = 3910
DATERANGEOID = 3912
INT8RANGEOID = 3926

# range OID → subtype OID, for the binary wire decoder (a range's
# send format embeds its bounds in the SUBTYPE's send format)
RANGE_SUBTYPE: dict[int, int] = {
    INT4RANGEOID: INT4OID, INT8RANGEOID: INT8OID,
    NUMRANGEOID: NUMERICOID, TSRANGEOID: TIMESTAMPOID,
    TSTZRANGEOID: TIMESTAMPTZOID, DATERANGEOID: DATEOID,
}

# name-keyed map (what you get from information_schema / JDBC metadata)
_NAME_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "bytea": T.BinaryType(),
    "char": T.StringType(),
    "bpchar": T.StringType(),
    "name": T.StringType(),
    "int2": T.ShortType(),
    "smallint": T.ShortType(),
    "int4": T.IntegerType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "int8": T.LongType(),
    "bigint": T.LongType(),
    "oid": T.LongType(),
    "tid": T.LongType(),  # ctid surfaces as page*2^16+row (reference: postgres_scanner.cpp:458)
    "float4": T.FloatType(),
    "real": T.FloatType(),
    "float8": T.DoubleType(),
    "float": T.DoubleType(),
    "double precision": T.DoubleType(),
    "double": T.DoubleType(),
    "decimal": T.DoubleType(),   # bare DECIMAL w/o (p,s), like NUMERIC
    "text": T.StringType(),
    "varchar": T.StringType(),
    "character varying": T.StringType(),
    "date": T.DateType(),
    "time": T.StringType(),       # Spark has no time-of-day type; text form (reference maps to TIME)
    "timetz": T.StringType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "interval": T.DayTimeIntervalType(),
    "uuid": T.StringType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "xml": T.StringType(),
    "money": T.StringType(),
    "macaddr": T.StringType(),
    "inet": T.StringType(),
    "cidr": T.StringType(),
    "bit": T.StringType(),
    "varbit": T.StringType(),
    # ranges → text form (reference varchar fallback); explicit so the
    # intent is visible even though unknown names fall back the same way
    "int4range": T.StringType(),
    "int8range": T.StringType(),
    "numrange": T.StringType(),
    "tsrange": T.StringType(),
    "tstzrange": T.StringType(),
    "daterange": T.StringType(),
    # built-in geometry (reference: postgres_utils.cpp TypeToLogicalType
    # GEOM_* annotations; test attach_geometry.test): point → {x,y}
    # struct, every other planar type → list<double>
    "point": T.StructType([T.StructField("x", T.DoubleType(), True),
                           T.StructField("y", T.DoubleType(), True)]),
    "line": T.ArrayType(T.DoubleType()),
    "lseg": T.ArrayType(T.DoubleType()),
    "box": T.ArrayType(T.DoubleType()),
    "path": T.ArrayType(T.DoubleType()),
    "polygon": T.ArrayType(T.DoubleType()),
    "circle": T.ArrayType(T.DoubleType()),
}

# geometry udt name → wire OID (decode_field has a branch per entry)
GEOMETRY_OIDS: dict[str, int] = {
    "point": POINTOID, "lseg": LSEGOID, "path": PATHOID, "box": BOXOID,
    "polygon": POLYGONOID, "line": LINEOID, "circle": CIRCLEOID,
}

_OID_TO_NAME: dict[int, str] = {
    BOOLOID: "bool", BYTEAOID: "bytea", CHAROID: "char", NAMEOID: "name",
    INT8OID: "int8", INT2OID: "int2", INT4OID: "int4", TEXTOID: "text",
    OIDOID: "oid", TIDOID: "tid", JSONOID: "json", XMLOID: "xml",
    POINTOID: "point", LSEGOID: "lseg", PATHOID: "path", BOXOID: "box",
    POLYGONOID: "polygon", LINEOID: "line", CIRCLEOID: "circle",
    FLOAT4OID: "float4", FLOAT8OID: "float8",
    MONEYOID: "money", MACADDROID: "macaddr", INETOID: "inet",
    CIDROID: "cidr", BPCHAROID: "bpchar", VARCHAROID: "varchar",
    DATEOID: "date", TIMEOID: "time", TIMESTAMPOID: "timestamp",
    TIMESTAMPTZOID: "timestamptz", INTERVALOID: "interval",
    TIMETZOID: "timetz", BITOID: "bit", VARBITOID: "varbit",
    NUMERICOID: "numeric", UUIDOID: "uuid", JSONBOID: "jsonb",
    INT4RANGEOID: "int4range", INT8RANGEOID: "int8range",
    NUMRANGEOID: "numrange", TSRANGEOID: "tsrange",
    TSTZRANGEOID: "tstzrange", DATERANGEOID: "daterange",
}


# standard PG array-type OID → element-type OID (pg_type.typelem for
# the built-in _<name> array types); used by the result-set schema
# probe, where cursor.description reports the ARRAY oid
ARRAY_OID_TO_ELEM: dict[int, int] = {
    1000: BOOLOID, 1001: BYTEAOID, 1002: CHAROID, 1003: NAMEOID,
    1005: INT2OID, 1007: INT4OID, 1016: INT8OID,
    1021: FLOAT4OID, 1022: FLOAT8OID,
    1009: TEXTOID, 1014: BPCHAROID, 1015: VARCHAROID,
    1115: TIMESTAMPOID, 1182: DATEOID, 1183: TIMEOID,
    1185: TIMESTAMPTZOID, 1187: INTERVALOID, 1231: NUMERICOID,
    199: JSONOID, 3807: JSONBOID, 2951: UUIDOID,
    # range arrays (daterange_array.test): _int4range, _numrange,
    # _tsrange, _tstzrange, _daterange, _int8range
    3905: INT4RANGEOID, 3907: NUMRANGEOID, 3909: TSRANGEOID,
    3911: TSTZRANGEOID, 3913: DATERANGEOID, 3927: INT8RANGEOID,
}


def spark_type_from_oid(
    oid: int,
    *,
    precision: int | None = None,
    scale: int | None = None,
) -> T.DataType:
    """Map a wire-protocol type OID (what cursor.description reports
    for an arbitrary result set) to Spark — the result-set analog of
    the reference's PostgresQueryBind, which derives the scan schema
    from the executed query's result descriptor rather than the
    table catalog (reference: src/postgres_query.cpp). Unknown OIDs
    (enums, domains, UDTs) fall back to varchar, same as the
    reference's TypeToLogicalType default."""
    elem = ARRAY_OID_TO_ELEM.get(oid)
    if elem is not None:
        name = _OID_TO_NAME.get(elem, "varchar")
        return pg_type_to_spark(name, precision=precision, scale=scale,
                                array_dims=1)
    name = _OID_TO_NAME.get(oid)
    if name is None:
        return T.StringType()
    return pg_type_to_spark(name, precision=precision, scale=scale)


def pg_type_to_spark(
    type_name: str,
    *,
    precision: int | None = None,
    scale: int | None = None,
    array_dims: int = 0,
) -> T.DataType:
    """Map a Postgres type name (optionally an N-dim array) to Spark.

    Mirrors reference src/postgres_utils.cpp TypeToLogicalType:
    - numeric with known precision/scale → decimal(p,s); unknown → double
      (the reference falls back to double for unconstrained NUMERIC)
    - enum/unknown → varchar
    - arrays → list (or varchar if pg_array_as_varchar)
    """
    base_name = type_name.strip().lower()
    if base_name.endswith("[]"):
        array_dims += base_name.count("[]")
        base_name = base_name.split("[", 1)[0].strip()
    if base_name == "numeric":
        if precision is not None and precision > 0 and precision <= 38:
            dt: T.DataType = T.DecimalType(precision, scale or 0)
        else:
            dt = T.DoubleType()
    else:
        dt = _NAME_TO_SPARK.get(base_name, T.StringType())  # enum/unknown → varchar
    if array_dims > 0:
        if SETTINGS.pg_array_as_varchar:
            return T.StringType()
        for _ in range(array_dims):
            dt = T.ArrayType(dt)
    return dt


def pg_oid_to_spark(oid: int, *, precision: int | None = None,
                    scale: int | None = None) -> T.DataType:
    return pg_type_to_spark(_OID_TO_NAME.get(oid, "text"),
                            precision=precision, scale=scale)


def composite_to_struct(fields: list[tuple[str, str]]) -> T.StructType:
    """Postgres composite type → StructType (reference: postgres_utils.cpp
    composite handling in TypeToLogicalType)."""
    return T.StructType([
        T.StructField(n, pg_type_to_spark(t), True) for n, t in fields
    ])


def spark_type_to_pg(dt: T.DataType) -> str:
    """Inverse map for DDL generation when writing back
    (reference: postgres_utils.cpp TypeToPostgres)."""
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.ByteType) or isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INTEGER"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "REAL"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE PRECISION"
    if isinstance(dt, T.DecimalType):
        return f"NUMERIC({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "VARCHAR"
    if isinstance(dt, T.BinaryType):
        return "BYTEA"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, (T.TimestampType,)):
        return "TIMESTAMPTZ"
    if isinstance(dt, (T.TimestampNTZType,)):
        return "TIMESTAMP"
    if isinstance(dt, T.DayTimeIntervalType):
        return "INTERVAL"
    if isinstance(dt, T.ArrayType):
        return spark_type_to_pg(dt.elementType) + "[]"
    if isinstance(dt, T.StructType):
        return "JSONB"  # structs round-trip as jsonb documents
    return "VARCHAR"
