"""Edge-TTS input bridge (edgetts/tts.py equivalent).

Synthesizes TTS audio to feed the converter. Requires the optional
``edge_tts`` package and network access; when unavailable, point the
pipeline at a pre-synthesized wav instead.
"""

from __future__ import annotations

import asyncio

# Voice table mirroring the reference's gender/language selection
# (edgetts/tts_voices.py): language -> (male voice, female voice).
SUPPORTED_VOICES = {
    "zh-CN": ("zh-CN-YunxiNeural", "zh-CN-XiaoyiNeural"),
    "en-US": ("en-US-GuyNeural", "en-US-AriaNeural"),
    "ja-JP": ("ja-JP-KeitaNeural", "ja-JP-NanamiNeural"),
    "ko-KR": ("ko-KR-InJoonNeural", "ko-KR-SunHiNeural"),
}


def synthesize(text: str, output_path: str, lang: str = "zh-CN",
               gender: str = "female", rate: str = "+0%", volume: str = "+0%") -> str:
    try:
        import edge_tts
    except ImportError as e:
        raise ImportError(
            "edge_tts is not installed (and this environment has no network "
            "egress); synthesize TTS input elsewhere and pass the wav to the "
            "converter instead"
        ) from e

    male, female = SUPPORTED_VOICES.get(lang, SUPPORTED_VOICES["en-US"])
    voice = female if gender == "female" else male

    async def _run():
        tts = edge_tts.Communicate(text=text, voice=voice, rate=rate, volume=volume)
        await tts.save(output_path)

    asyncio.run(_run())
    return output_path
