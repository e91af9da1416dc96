"""UDP capture bridge — the collector's socket front end.

Spark has no UDP source, so the reference's capture loop (scapture.c:25-61,
one thread per configured port) becomes a tiny bridge process that
receives datagrams and appends them to rolling parquet files which a
``readStream`` file source (or any queue in production — Kafka etc.)
consumes. Packets are stored raw: (data binary, dev_ip long, recv_ts
timestamp) — decoding happens distributed in decode_packets_df.

At production scale this bridge is the only single-node component, doing
no work but recv+append (the reference's capture thread does decode +
filter + aggregate on that same thread); sharding across ports/hosts
matches the reference's operational model (STEP-BY-STEP.md:138-156).
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time


class ParquetSpool:
    """Rolling (data, dev_ip, recv_ts) parquet writer shared by every
    single-node capture front end (UDP bridge, live AF_PACKET capture).
    Spool names must be unique across WRITERS (several captures share
    one spool dir) and across RESTARTS (seq restarts at 0, but the file
    source has already recorded the old paths as processed — recycled
    names would be silently skipped; equal names from a sibling writer
    would be clobbered by os.rename)."""

    def __init__(self, out_dir: str, tag: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._seq = 0
        self._uniq = f"{tag}_{os.getpid()}_{time.time_ns()}"

    def flush(self, batch: list[tuple[bytes, int, float]]) -> None:
        if not batch:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table({
            "data": pa.array([b for b, _, _ in batch], type=pa.binary()),
            "dev_ip": pa.array([ip for _, ip, _ in batch], type=pa.int64()),
            "recv_ts": pa.array(
                [int(ts * 1e6) for _, _, ts in batch],
                type=pa.timestamp("us"),
            ),
        })
        # write-then-rename so the file source never reads half a file
        stem = f"p{self._uniq}_{self._seq:08d}.parquet"
        tmp = os.path.join(self.out_dir, "." + stem + ".tmp")
        final = os.path.join(self.out_dir, stem)
        pq.write_table(table, tmp)
        os.rename(tmp, final)
        self._seq += 1


class UdpBridge:
    def __init__(
        self,
        out_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        roll_packets: int = 1000,
        roll_seconds: float = 1.0,
        template_journal=None,
    ):
        """``template_journal``: optional sources.netflow.TemplateJournal;
        template-bearing packets (rare) are appended so templates survive
        daemon restarts (netflow-templates.c parity)."""
        self.out_dir = out_dir
        self.template_journal = template_journal
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind((host, port))
        self.sock.settimeout(0.2)
        self.port = self.sock.getsockname()[1]
        self.roll_packets = roll_packets
        self.roll_seconds = roll_seconds
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._spool = ParquetSpool(out_dir, str(self.port))

    def _flush(self, batch: list[tuple[bytes, int, float]]) -> None:
        self._spool.flush(batch)

    def _loop(self) -> None:
        batch: list[tuple[bytes, int, float]] = []
        last = time.monotonic()
        while not self._stop.is_set():
            try:
                data, addr = self.sock.recvfrom(65535)
                ip = struct.unpack(">I", socket.inet_aton(addr[0]))[0]
                batch.append((data, ip, time.time()))
                if self.template_journal is not None:
                    from xenoeye_spark.sources.netflow import (
                        packet_has_templates,
                    )

                    if packet_has_templates(data):
                        self.template_journal.append_packet(data, ip)
            except socket.timeout:
                pass
            except OSError as e:
                # a malformed peer address or socket hiccup must not
                # kill the capture thread — the daemon would look
                # healthy while dropping every later datagram silently
                print(f"udp_bridge :{self.port}: dropped datagram: {e}",
                      file=__import__("sys").stderr)
            now = time.monotonic()
            if batch and (
                len(batch) >= self.roll_packets
                or now - last >= self.roll_seconds
            ):
                try:
                    self._flush(batch)
                    batch = []
                except OSError as e:
                    # transient write failure (disk full, FS blip): keep
                    # the batch, retry next roll; capture survives. A
                    # PERSISTENT failure must not grow the batch without
                    # bound — shed oldest packets past 10 rolls' worth
                    # (the reference's kernel socket buffer would drop
                    # the same packets, just earlier)
                    cap = 10 * self.roll_packets
                    if len(batch) > cap:
                        del batch[: len(batch) - cap]
                    print(
                        f"udp_bridge :{self.port}: flush failed "
                        f"({e}); retrying next roll",
                        file=__import__("sys").stderr,
                    )
                last = now
        try:
            self._flush(batch)
        except OSError:
            pass

    def start(self) -> "UdpBridge":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        self.sock.close()
