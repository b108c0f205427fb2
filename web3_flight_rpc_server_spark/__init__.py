"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference Arrow Flight RPC server
(Broscorp-net/web3-flight-rpc-server, snapshot at /root/reference/).

Not a port: the reference is a Java Arrow-Flight bridge from Ethereum
JSON-RPC to Arrow streams whose analytics live client-side in a pandas
notebook. This package re-expresses both surfaces idiomatically in
Spark:

- ``sources``   bounded/unbounded dataset loading (parquet fixtures,
                request->plan mapping mirroring the reference ticket
                semantics, reference/server/src/main/java/net/broscorp/
                web3/producer/Producer.java:38-64)
- ``plans``     the client-request model (dataset/startBlock/endBlock/
                contractAddresses/topics -> DataFrame plan)
- ``functions`` scalar helpers (hex decode, text stats, vector math)
- ``operators`` composite operators (as-of join, dedup families,
                similarity search, multimodal plumbing)
- ``queries``   the declared query inventory (SURVEY.md section 2) with
                DuckDB oracle twins, exposed through __spark_entry__
- ``streaming`` Structured Streaming surface (windows, watermarking,
                stateful dedup, backfill->realtime hybrid)
"""

__version__ = "0.1.0"
