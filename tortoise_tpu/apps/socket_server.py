"""TCP streaming TTS server (reference: tortoise/socket_server.py).

Protocol: client sends ``voice_name|text``; the server streams float32 PCM
chunks (24 kHz mono, little-endian) and terminates each utterance batch with
the ``END_OF_AUDIO`` sentinel. Sentence chunking uses the framework's own
splitter (the reference depended on spacy for this).

Unlike the reference — which shares one unguarded TextToSpeech across client
threads (a real race, SURVEY §5) — synthesis requests are serialized through
a worker lock; the compiled TPU programs are single-stream anyway.
"""
from __future__ import annotations

import argparse
import socket
import threading

import numpy as np

END_OF_AUDIO = b"END_OF_AUDIO"


class TTSServer:
    def __init__(self, host="0.0.0.0", port=5000, models_dir=None, tts=None):
        self.host = host
        self.port = port
        if tts is None:
            from tortoise_tpu.api_fast import TextToSpeechFast

            tts = TextToSpeechFast(models_dir=models_dir)
        self.tts = tts
        self._lock = threading.Lock()  # serialize access to the compiled pipeline
        self._voice_cache: dict[str, object] = {}
        self._server: socket.socket | None = None

    def _latents_for(self, voice: str):
        if voice not in self._voice_cache:
            from tortoise_tpu.utils.audio import load_voices

            voice_samples, latents = load_voices([voice])
            if voice_samples is not None:
                latents = self.tts.get_conditioning_latents(voice_samples)
            elif isinstance(latents, tuple):
                latents = latents[0]
            self._voice_cache[voice] = latents
        return self._voice_cache[voice]

    def handle_client(self, client: socket.socket):
        from tortoise_tpu.utils.text import split_and_recombine_text

        try:
            while True:
                data = client.recv(1024).decode("utf-8")
                if not data:
                    break
                voice, text = data.split("|", 1)
                latents = self._latents_for(voice.strip())
                for chunk_text in split_and_recombine_text(text):
                    with self._lock:
                        for audio_chunk in self.tts.tts_stream(
                                chunk_text, conditioning_latents=latents,
                                verbose=False):
                            client.sendall(np.asarray(audio_chunk,
                                                      np.float32).tobytes())
                client.sendall(END_OF_AUDIO)
        except (ConnectionResetError, BrokenPipeError):
            pass
        finally:
            client.close()

    def serve_forever(self):
        self._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._server.bind((self.host, self.port))
        self._server.listen(5)
        print(f"Server listening on port {self.port}")
        while True:
            client, addr = self._server.accept()
            print(f"Accepted connection from {addr}")
            threading.Thread(target=self.handle_client, args=(client,),
                             daemon=True).start()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--model_dir", default=None)
    args = parser.parse_args(argv)
    TTSServer(args.host, args.port, args.model_dir).serve_forever()


if __name__ == "__main__":
    main()
