"""Socket serving protocol: voice|text -> float32 PCM stream + END_OF_AUDIO."""
import socket
import threading
import time
import warnings

import numpy as np
import pytest

import jax.numpy as jnp

from tortoise_tpu.api_fast import TextToSpeechFast
from tortoise_tpu.apps.socket_client import receive_audio
from tortoise_tpu.apps.socket_server import TTSServer
from tortoise_tpu.models.autoregressive import UnifiedVoiceConfig

# real-TCP serving e2e (~1 min incl. fixture); inner loop skips via -m 'not slow'
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def server():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = TextToSpeechFast(
            dtype=jnp.float32,
            ar_config=UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                                         max_text_tokens=60, max_mel_tokens=48),
            latent_bucket=16)
    srv = TTSServer(host="127.0.0.1", port=0, tts=tts)

    # bind manually on an ephemeral port so the test can discover it
    srv._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv._server.bind(("127.0.0.1", 0))
    srv._server.listen(5)
    port = srv._server.getsockname()[1]

    def accept_loop():
        while True:
            try:
                client, _ = srv._server.accept()
            except OSError:
                return
            threading.Thread(target=srv.handle_client, args=(client,),
                             daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()
    yield srv, port
    srv._server.close()


def test_socket_roundtrip(server):
    srv, port = server
    audio = receive_audio("127.0.0.1", port, "random", "A socket test sentence.")
    assert audio.dtype == np.float32
    assert len(audio) > 1000
    assert np.isfinite(audio).all()


def test_socket_two_requests_one_connection(server):
    srv, port = server
    a1 = receive_audio("127.0.0.1", port, "random", "First.")
    a2 = receive_audio("127.0.0.1", port, "random", "Second request, longer text.")
    assert len(a1) > 0 and len(a2) > 0
