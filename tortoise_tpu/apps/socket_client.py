"""TCP streaming client (reference: tortoise/socket_client.py): send
``voice|text``, receive float32 PCM until END_OF_AUDIO; play via sounddevice
when available, else save to wav."""
from __future__ import annotations

import argparse
import socket

import numpy as np

END_OF_AUDIO = b"END_OF_AUDIO"


def receive_audio(host: str, port: int, voice: str, text: str) -> np.ndarray:
    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.connect((host, port))
    sock.sendall(f"{voice}|{text}".encode("utf-8"))
    buf = b""
    while True:
        data = sock.recv(4096)
        if not data:
            break
        buf += data
        if buf.endswith(END_OF_AUDIO):
            buf = buf[: -len(END_OF_AUDIO)]
            break
    sock.close()
    n = len(buf) // 4 * 4
    return np.frombuffer(buf[:n], dtype=np.float32)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--voice", default="random")
    parser.add_argument("--text", default="Hello from the socket client.")
    parser.add_argument("--output", default="client_out.wav")
    args = parser.parse_args(argv)

    audio = receive_audio(args.host, args.port, args.voice, args.text)
    print(f"received {len(audio) / 24000:.2f}s of audio")
    try:
        import sounddevice as sd

        sd.play(audio, 24000)
        sd.wait()
    except ImportError:
        from tortoise_tpu.utils.audio import save_wav

        save_wav(args.output, audio, 24000)
        print("wrote", args.output)


if __name__ == "__main__":
    main()
