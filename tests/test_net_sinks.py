"""Network sink tests: UDP JSON feed and TCP SBS feed over loopback."""
import json
import socket
import threading

import numpy as np

from vdlm2dec_tpu import framegen as fg
from vdlm2dec_tpu.golden.codec import frame_fcs
from vdlm2dec_tpu.host.decoder import FrameDecoder
from vdlm2dec_tpu.host.output import NetSink, OutputConfig
from vdlm2dec_tpu.pipeline import DecodedBurst


def _with_flags(content):
    fcs = frame_fcs(content)
    return np.concatenate(
        [[0x7E], content, [fcs & 0xFF, fcs >> 8], [0x7E]]
    ).astype(np.uint8)


def _mk_burst(frames):
    return DecodedBurst(
        channel=0, t0=0, time_s=0.5, freq_hz=136_975_000.0, ppm=1.5,
        length_bits=0, nbrow=1, nlbyte=0, block=np.zeros((1, 255), np.uint8),
        rs_counts=[0], frames=frames,
    )


def test_udp_json_feed():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5)
    port = rx.getsockname()[1]

    cfg = OutputConfig(verbose=0, net_json_addr=f"127.0.0.1:{port}")
    dec = FrameDecoder(cfg, time_base=1_700_000_000.0)
    content = fg.acars_frame(text="UDP TEST", label="Q0")
    dec.process_burst(_mk_burst([_with_flags(content)]))

    data, _ = rx.recvfrom(65536)
    obj = json.loads(data.decode())
    assert obj["text"] == "UDP TEST"
    assert data.endswith(b"\n")
    rx.close()


def test_tcp_sbs_feed():
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    received = []

    def accept():
        conn, _ = srv.accept()
        conn.settimeout(5)
        received.append(conn.recv(65536))
        conn.close()

    th = threading.Thread(target=accept)
    th.start()

    cfg = OutputConfig(verbose=0, net_sbs_addr=f"127.0.0.1:{port}")
    dec = FrameDecoder(cfg, time_base=1_700_000_000.0)
    # position via XID gives an SBS MSG,3
    content = fg.xid_frame()
    dec.process_burst(_mk_burst([_with_flags(content)]))
    th.join(timeout=5)
    srv.close()
    assert received
    line = received[0].decode()
    assert line.startswith("MSG,")
    assert line.endswith("\r\n")


def test_netsink_reconnect():
    sink = NetSink("127.0.0.1:1", dgram=False)   # nothing listening
    assert sink.write(b"x") == -1                # fails, no crash
    assert sink.sock is None
