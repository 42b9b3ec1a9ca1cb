

def test_gunzip_real_decompression(spark):
    """functions.gunzip is a REAL zlib-backed decompressor (stub retired
    round 4): gzip and zlib framings decode; malformed and NULL → NULL."""
    import gzip as _g
    import zlib

    from pyspark.sql import functions as F

    from feldera_spark.functions import gunzip

    rows = [
        (1, _g.compress("hello wörld".encode("utf-8"))),
        (2, zlib.compress(b"plain zlib frame")),
        (3, b"\x00\x01not-a-gzip"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id INT, blob BINARY")
    got = {
        r["id"]: r["out"]
        for r in df.select("id", gunzip("blob").alias("out")).collect()
    }
    assert got == {1: "hello wörld", 2: "plain zlib frame", 3: None, 4: None}
