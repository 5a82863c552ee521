"""The browser web client (webclient/ parity, stand-in scope).

The reference webclient is the whole gui_client compiled to WebAssembly
with Emscripten — a renderer-scale artifact.  What this page preserves is
the capability that matters to the simulation framework: a REAL protocol
client in the browser.  The JS below speaks the binary Substrata protocol
(hello/version/connection-type handshake, length-prefixed v54 messages)
over the WebSocket the webserver upgrades into a game WorkerThread
(net/websocket.py; WebServerRequestHandler.cpp:874-882 parity), replicates
the world (objects incl. live physics transforms, avatars, chat), renders
a top-down canvas view, and participates: it creates an avatar, moves with
WASD (AvatarTransformUpdate at 10 Hz like the native client's send pass),
and chats.

Authentication: the page is served same-origin, so the browser attaches
the site's session cookie to the WebSocket upgrade automatically — a
logged-in web user is account-bound on the game connection
(WorkerThread.cpp:183-187 cookie-login parity; net/server.py
effective_user_id).
"""

WEBCLIENT_HTML = r"""<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>substrata-tpu webclient</title>
<style>
  html, body { margin: 0; height: 100%; background: #101418;
               font: 13px monospace; color: #cde; overflow: hidden; }
  #view { position: absolute; inset: 0; width: 100%; height: 100%; }
  #hud  { position: absolute; top: 8px; left: 8px; background: #0008;
          padding: 6px 8px; border-radius: 4px; white-space: pre; }
  #chat { position: absolute; bottom: 8px; left: 8px; width: 360px; }
  #log  { background: #0008; height: 120px; overflow-y: auto;
          padding: 4px 6px; border-radius: 4px; }
  #msg  { width: 100%; box-sizing: border-box; background: #223;
          color: #cde; border: 1px solid #446; padding: 4px; }
  .sys  { color: #8a9; }
</style>
</head>
<body>
<canvas id="view"></canvas>
<div id="hud">connecting...</div>
<div id="chat"><div id="log"></div>
<input id="msg" placeholder="chat (enter) — WASD to move, wheel to zoom"></div>
<script>
"use strict";
// ---- protocol constants (net/protocol.py / shared/Protocol.h) ----
const HELLO = 1357924680, VERSION = 54, PROTOCOL_OK = 10000;
const CONN_UPDATES = 500;
const AVATAR_CREATED = 1000, AVATAR_DESTROYED = 1001,
      AVATAR_TRANSFORM_UPDATE = 1002, AVATAR_FULL_UPDATE = 1003,
      CHAT_MESSAGE = 2000,
      OBJECT_CREATED = 3000, OBJECT_DESTROYED = 3001,
      OBJECT_TRANSFORM_UPDATE = 3002, OBJECT_FULL_UPDATE = 3003,
      OBJECT_PHYSICS_TRANSFORM_UPDATE = 3016, OBJECT_INITIAL_SEND = 3021,
      TIME_SYNC = 9000;

// ---- little-endian stream reader ----
class Reader {
  constructor(buf) { this.dv = new DataView(buf); this.off = 0; }
  u32() { const v = this.dv.getUint32(this.off, true); this.off += 4; return v; }
  u64() { const v = this.dv.getBigUint64(this.off, true); this.off += 8; return Number(v); }
  f32() { const v = this.dv.getFloat32(this.off, true); this.off += 4; return v; }
  f64() { const v = this.dv.getFloat64(this.off, true); this.off += 8; return v; }
  str() { const n = this.u32();
          const s = new TextDecoder().decode(
            new Uint8Array(this.dv.buffer, this.dv.byteOffset + this.off, n));
          this.off += n; return s; }
  skip(n) { this.off += n; }
}
class Writer {
  constructor() { this.parts = []; }
  u32(v) { const b = new DataView(new ArrayBuffer(4)); b.setUint32(0, v, true); this.parts.push(b.buffer); return this; }
  u64(v) { const b = new DataView(new ArrayBuffer(8)); b.setBigUint64(0, BigInt(v), true); this.parts.push(b.buffer); return this; }
  f32(v) { const b = new DataView(new ArrayBuffer(4)); b.setFloat32(0, v, true); this.parts.push(b.buffer); return this; }
  f64(v) { const b = new DataView(new ArrayBuffer(8)); b.setFloat64(0, v, true); this.parts.push(b.buffer); return this; }
  str(s) { const e = new TextEncoder().encode(s); this.u32(e.length); this.parts.push(e.buffer); return this; }
  bytes() { let n = 0; for (const p of this.parts) n += p.byteLength;
            const out = new Uint8Array(n); let o = 0;
            for (const p of this.parts) { out.set(new Uint8Array(p), o); o += p.byteLength; }
            return out; }
}

// ---- world replica ----
const objects = new Map();   // uid -> {x, y, sx, sy, type}
const avatars = new Map();   // uid -> {x, y, name}
let myUid = 0, myName = "web" + Math.floor(Math.random() * 1000);
const me = { x: 0, y: 0, z: 1.67, heading: 0 };
let zoom = 6;                // px per metre

function decodeObject(r, uid) {
  const ob = {};
  ob.uid = (uid === undefined) ? r.u64() : uid;
  ob.type = r.u32();
  ob.model_url = r.str(); r.str(); r.str(); r.str(); r.str(); r.str();
  r.f32();                                   // audio volume
  ob.x = r.f64(); ob.y = r.f64(); ob.z = r.f64();
  r.f32(); r.f32(); r.f32(); r.f32();        // axis + angle
  ob.sx = r.f32(); ob.sy = r.f32(); r.f32(); // scale
  r.u32(); r.u32(); r.f32();                 // flags, creator, created
  r.f32(); r.f32(); r.f32();                 // mass/fric/rest
  r.f32(); r.f32(); r.f32();                 // com offset
  r.u32(); r.f64();                          // owner, owner time
  const nmats = r.u32();
  for (let i = 0; i < nmats; i++) {          // WorldMaterial
    r.f32(); r.f32(); r.f32(); r.str(); r.str();
    r.f32(); r.f32(); r.f32(); r.f32(); r.u32();
  }
  const nvox = r.u32(); r.skip(nvox);
  return ob;
}

function log(line, sys) {
  const el = document.createElement("div");
  if (sys) el.className = "sys";
  el.textContent = line;
  const box = document.getElementById("log");
  box.appendChild(el); box.scrollTop = box.scrollHeight;
}

// ---- connection state machine ----
const proto = location.protocol === "https:" ? "wss" : "ws";
const ws = new WebSocket(proto + "://" + location.host + "/");
ws.binaryType = "arraybuffer";
let stage = 0;               // 0 wait hello reply, 1 wait uid, 2 messages
let acc = new Uint8Array(0);

ws.onopen = () => {
  ws.send(new Writer().u32(HELLO).u32(VERSION).bytes());
};
ws.onclose = () => { document.getElementById("hud").textContent = "disconnected"; };

function sendMsg(type, payload) {
  const head = new Writer().u32(type).u32(payload.length + 8).bytes();
  const out = new Uint8Array(head.length + payload.length);
  out.set(head, 0); out.set(payload, head.length);
  ws.send(out);
}

function sendAvatarCreated() {
  const p = new Writer().u64(myUid).str(myName)
    .f64(me.x).f64(me.y).f64(me.z)
    .f32(0).f32(0).f32(me.heading).u32(0)   // rotation(rpy) + anim state
    .str("")                                 // avatar model url
    .u64(0).u32(0).u32(0);                   // vehicle, seat, input bits
  sendMsg(AVATAR_CREATED, p.bytes());
}
function sendAvatarTransform() {
  const p = new Writer().u64(myUid)
    .f32(me.x).f32(me.y).f32(me.z)
    .f32(0).f32(0).f32(me.heading)
    .u32(1)                                  // anim: moving
    .u64(0).u32(0).u32(0);
  sendMsg(AVATAR_TRANSFORM_UPDATE, p.bytes());
}

ws.onmessage = (ev) => {
  const incoming = new Uint8Array(ev.data);
  const joined = new Uint8Array(acc.length + incoming.length);
  joined.set(acc, 0); joined.set(incoming, acc.length);
  acc = joined;
  for (;;) {
    if (stage === 0) {
      if (acc.length < 8) return;
      const r = new Reader(acc.buffer.slice(0, 8));
      const code = r.u32();
      if (code !== PROTOCOL_OK) { log("server rejected protocol " + code); ws.close(); return; }
      acc = acc.slice(8);
      ws.send(new Writer().u32(CONN_UPDATES).u32(0).u32(0).bytes()); // caps=0, world=""
      stage = 1;
    } else if (stage === 1) {
      if (acc.length < 8) return;
      myUid = new Reader(acc.buffer.slice(0, 8)).u64();
      acc = acc.slice(8);
      stage = 2;
      log("connected as avatar " + myUid, true);
      sendAvatarCreated();
    } else {
      if (acc.length < 8) return;
      const head = new Reader(acc.buffer.slice(0, 8));
      const type = head.u32(), len = head.u32();
      if (acc.length < len) return;
      const payload = acc.buffer.slice(acc.byteOffset + 8, acc.byteOffset + len);
      acc = acc.slice(len);
      handleMessage(type, payload);
    }
  }
};

function handleMessage(type, payload) {
  const r = new Reader(payload);
  if (type === OBJECT_CREATED || type === OBJECT_INITIAL_SEND ||
      type === OBJECT_FULL_UPDATE) {
    const ob = decodeObject(r);
    objects.set(ob.uid, ob);
  } else if (type === OBJECT_DESTROYED) {
    objects.delete(r.u64());
  } else if (type === OBJECT_PHYSICS_TRANSFORM_UPDATE) {
    const uid = r.u64(), ob = objects.get(uid);
    if (ob) { ob.x = r.f32(); ob.y = r.f32(); }  // z/quat/vel follow
  } else if (type === OBJECT_TRANSFORM_UPDATE) {
    const uid = r.u64(), ob = objects.get(uid);
    if (ob) { ob.x = r.f64(); ob.y = r.f64(); }
  } else if (type === AVATAR_CREATED || type === AVATAR_FULL_UPDATE) {
    const uid = r.u64(), name = r.str();
    const x = r.f64(), y = r.f64();
    if (uid !== myUid) avatars.set(uid, { x: x, y: y, name: name });
  } else if (type === AVATAR_TRANSFORM_UPDATE) {
    const uid = r.u64(), av = avatars.get(uid);
    if (av) { av.x = r.f32(); av.y = r.f32(); }
  } else if (type === AVATAR_DESTROYED) {
    avatars.delete(r.u64());
  } else if (type === CHAT_MESSAGE) {
    log(r.str() + ": " + r.str());
  } else if (type === TIME_SYNC) {
    // global time — displayed clients slew their clock; fine to ignore here
  } // unknown types skipped by framing
}

// ---- input ----
const keys = {};
addEventListener("keydown", e => {
  if (document.activeElement === document.getElementById("msg")) return;
  keys[e.key.toLowerCase()] = true;
});
addEventListener("keyup", e => { keys[e.key.toLowerCase()] = false; });
addEventListener("wheel", e => {
  zoom = Math.min(40, Math.max(1, zoom * (e.deltaY < 0 ? 1.15 : 0.87)));
});
document.getElementById("msg").addEventListener("keydown", e => {
  if (e.key === "Enter" && e.target.value.trim()) {
    sendMsg(CHAT_MESSAGE, new Writer().str(myName).str(e.target.value).bytes());
    log(myName + ": " + e.target.value);
    e.target.value = "";
  }
});

let lastSend = 0, moved = false;
setInterval(() => {                        // 20 Hz movement integration
  const sp = (keys["shift"] ? 15 : 3) / 20;  // MOVE_SPEED 3, run x5
  let dx = 0, dy = 0;
  if (keys["w"] || keys["arrowup"]) dy += sp;
  if (keys["s"] || keys["arrowdown"]) dy -= sp;
  if (keys["a"] || keys["arrowleft"]) dx -= sp;
  if (keys["d"] || keys["arrowright"]) dx += sp;
  if (dx || dy) {
    me.x += dx; me.y += dy;
    me.heading = Math.atan2(-dx, dy);
    moved = true;
  }
  const now = performance.now();
  if (moved && stage === 2 && now - lastSend > 100) {  // 10 Hz send pass
    sendAvatarTransform(); lastSend = now; moved = false;
  }
}, 50);

// ---- renderer ----
const canvas = document.getElementById("view");
const ctx = canvas.getContext("2d");
const TYPE_COLORS = { 0: "#8a93a0", 2: "#d98e3a", 6: "#6ac46a", 7: "#b36ae0",
                      3: "#e8d44d", 5: "#5ac8dc" };
function draw() {
  canvas.width = innerWidth; canvas.height = innerHeight;
  ctx.fillStyle = "#15221c"; ctx.fillRect(0, 0, canvas.width, canvas.height);
  const cx = canvas.width / 2, cy = canvas.height / 2;
  const wx = p => cx + (p[0] - me.x) * zoom;
  const wy = p => cy - (p[1] - me.y) * zoom;
  // grid every 10 m
  ctx.strokeStyle = "#1e3028"; ctx.lineWidth = 1;
  const step = 10 * zoom;
  for (let x = ((cx - me.x * zoom) % step + step) % step; x < canvas.width; x += step)
    { ctx.beginPath(); ctx.moveTo(x, 0); ctx.lineTo(x, canvas.height); ctx.stroke(); }
  for (let y = ((cy + me.y * zoom) % step + step) % step; y < canvas.height; y += step)
    { ctx.beginPath(); ctx.moveTo(0, y); ctx.lineTo(canvas.width, y); ctx.stroke(); }
  for (const ob of objects.values()) {
    const w = Math.max(3, (ob.sx || 1) * zoom), h = Math.max(3, (ob.sy || 1) * zoom);
    ctx.fillStyle = TYPE_COLORS[ob.type] || "#8a93a0";
    ctx.fillRect(wx([ob.x, ob.y]) - w / 2, wy([ob.x, ob.y]) - h / 2, w, h);
  }
  ctx.font = "11px monospace"; ctx.textAlign = "center";
  for (const [uid, av] of avatars) {
    ctx.fillStyle = "#57a8ff";
    ctx.beginPath();
    ctx.arc(wx([av.x, av.y]), wy([av.x, av.y]), Math.max(4, 0.35 * zoom), 0, 7);
    ctx.fill();
    ctx.fillText(av.name || ("av" + uid), wx([av.x, av.y]), wy([av.x, av.y]) - 8);
  }
  ctx.fillStyle = "#6aff8a";                       // self
  ctx.beginPath(); ctx.arc(cx, cy, Math.max(4, 0.35 * zoom), 0, 7); ctx.fill();
  ctx.fillText(myName, cx, cy - 8);
  document.getElementById("hud").textContent =
    `${myUid ? "avatar " + myUid : "connecting"}  pos ${me.x.toFixed(1)},` +
    `${me.y.toFixed(1)}  objects ${objects.size}  avatars ${avatars.size + 1}`;
  requestAnimationFrame(draw);
}
requestAnimationFrame(draw);
</script>
</body>
</html>
"""
