"""HTTP serving layer: first-party ASGI micro-framework + HTTP server.

Replaces the reference's FastAPI/uvicorn stack
(/root/reference/backend/app/main.py:48-71, backend/run.py) — neither is
available in this environment, and the framework ships its own serving
runtime anyway: routing, multipart forms, CORS, static files, background
tasks, and an asyncio HTTP/1.1 server.
"""
