"""ModelTransport: batching, retry, length validation, and the three model
functions end-to-end with an injected fake HTTP client."""

import pytest

from flink_cdc_dsql_master_spark.functions import (
    ModelTransport,
    ai_chat_predict_udf,
    ai_langchain_predict_udf,
    get_embedding_udf,
)
from flink_cdc_dsql_master_spark.sinks import RetryPolicy


class FakeClient:
    """Injected fake endpoint: records batch sizes, fails N times first."""

    def __init__(self, fail_first=0):
        self.batches = []
        self.fails_left = fail_first

    def post(self, inputs):
        if self.fails_left > 0:
            self.fails_left -= 1
            raise ConnectionError("transient")
        self.batches.append(len(inputs))
        return [f"r:{x}" for x in inputs]


def test_transport_batches_and_validates():
    client = FakeClient()
    t = ModelTransport(client.post, batch_size=10)
    out = t.call([f"x{i}" for i in range(25)])
    assert out == [f"r:x{i}" for i in range(25)]
    assert client.batches == [10, 10, 5]

    bad = ModelTransport(lambda xs: xs[:-1], batch_size=100,
                         retry=RetryPolicy(max_retries=0))
    with pytest.raises(RuntimeError, match="results for a batch"):
        bad.call(["a", "b"])


def test_transport_retries_transient_failures():
    client = FakeClient(fail_first=2)
    t = ModelTransport(client.post, batch_size=4,
                       retry=RetryPolicy(max_retries=3, base_delay_s=0.0))
    assert t.call(["a", "b"]) == ["r:a", "r:b"]
    assert client.batches == [2]  # succeeded on the third attempt

    worn = FakeClient(fail_first=5)
    t2 = ModelTransport(worn.post, batch_size=4,
                        retry=RetryPolicy(max_retries=2, base_delay_s=0.0))
    with pytest.raises(ConnectionError):
        t2.call(["a"])


def test_model_udfs_with_injected_transport(spark):
    df = spark.createDataFrame([("alpha",), ("beta",), (None,)], "text string")

    def embed_post(texts):
        return [None if t is None else [float(len(t)), 1.0] for t in texts]

    emb = get_embedding_udf(transport=ModelTransport(embed_post, batch_size=2))
    got = {r["text"]: r["e"] for r in
           df.select("text", emb("text").alias("e")).collect()}
    assert got["alpha"] == [5.0, 1.0] and got[None] is None

    def chat_post(prompts):
        return [None if p is None else f"echo({p})" for p in prompts]

    chat = ai_chat_predict_udf(transport=ModelTransport(chat_post))
    got = [r["c"] for r in df.select(chat("text").alias("c")).collect()]
    assert "echo(alpha)" in got and None in got

    def lc_post(prompts):
        return [p.upper() for p in prompts]

    lc = ai_langchain_predict_udf(
        transport=ModelTransport(lc_post), template="Q: {input}?")
    out = (df.where("text IS NOT NULL")
           .select(lc("text").alias("c")).collect())
    # the chain renders the template BEFORE the transport call: the
    # uppercase-echo endpoint output contains the template text, proving it
    # received finished prompts (UDFs run in executor processes, so a
    # driver-side `seen` list cannot observe this directly)
    assert sorted(r["c"] for r in out) == ["Q: ALPHA?", "Q: BETA?"]


def test_transport_over_real_http(spark):
    """A REAL HTTP round trip: a localhost JSON /embeddings endpoint
    (stdlib http.server) receives the transport's batched POSTs; the
    driver-side check proves batching on the wire (ceil(N/batch) calls)
    and result alignment — the pluggable-endpoint claim demonstrated
    over an actual socket, not an injected callable."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from flink_cdc_dsql_master_spark.functions import ModelTransport

    calls = []

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            body = json.loads(self.rfile.read(n))
            calls.append(len(body["input"]))
            vecs = [[float(len(t)), 1.0] for t in body["input"]]
            out = json.dumps({"data": vecs}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def post(texts):
            import json as j
            import urllib.request

            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/embeddings",
                data=j.dumps({"input": list(texts)}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=10) as r:
                return j.loads(r.read())["data"]

        tr = ModelTransport(post, batch_size=4)
        texts = [f"t{i}" * (i + 1) for i in range(10)]
        got = tr.call(texts)
        assert [v[0] for v in got] == [float(len(t)) for t in texts]
        assert calls == [4, 4, 2]  # micro-batching visible on the wire
    finally:
        srv.shutdown()
