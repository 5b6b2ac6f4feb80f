// Execute the extracted cartpole_tpu page script under node with a
// browser-stub environment and drive its full interaction surface:
// poll -> draw -> plots, mouse poke, sliders, cost-equality checkbox,
// controller toggle, reset and download buttons. The /state payload is a
// REAL server snapshot (scripts/dump_state_json.py), so schema drift
// between server and front end fails here.
//
//   python3 scripts/extract_page_js.py > /tmp/page.js
//   python3 scripts/dump_state_json.py > /tmp/state.json
//   node scripts/page_js_harness.js /tmp/page.js /tmp/state.json
//
// Used by the CI frontend job (.github/workflows/ci.yml); mirrored by
// tests/test_web_frontend.py::test_page_js_executes_under_node when node
// is available. The reference equivalent is its webpack production build
// + eslint gate (/root/reference/.github/workflows/linux.yml:79-92).
'use strict';
const fs = require('fs');

const [, , pageJsPath, statePath] = process.argv;
if (!pageJsPath || !statePath) {
  console.error('usage: node page_js_harness.js <page.js> <state.json>');
  process.exit(2);
}
const src = fs.readFileSync(pageJsPath, 'utf8');
const statePayload = JSON.parse(fs.readFileSync(statePath, 'utf8'));

function assert(cond, msg) {
  if (!cond) throw new Error('assertion failed: ' + msg);
}

// ------------------------------------------------------- canvas 2d stub
const ctxCalls = [];
function makeCtx2d() {
  const target = {};
  return new Proxy(target, {
    get(t, prop) {
      if (!(prop in t)) {
        t[prop] = (...args) => {
          ctxCalls.push(String(prop));
        };
      }
      return t[prop];
    },
    set(t, prop, v) {
      t[prop] = v;
      return true;
    },
  });
}

// ------------------------------------------------------------- elements
const elements = new Map();
function fire(el, type, ev) {
  const fns = el._listeners.get(type) || [];
  assert(fns.length > 0, `a ${type} listener on #${el.id}`);
  for (const fn of fns) {
    fn(Object.assign({ preventDefault() {}, target: el }, ev));
  }
}
function makeElement(id) {
  const listeners = new Map();
  const el = {
    id,
    width: 800,
    height: 450,
    style: {},
    textContent: '',
    value: '0',
    min: 0,
    max: 1,
    step: 1,
    checked: false,
    disabled: false,
    href: '',
    download: '',
    _listeners: listeners,
    getContext: () => makeCtx2d(),
    addEventListener(type, fn) {
      if (!listeners.has(type)) listeners.set(type, []);
      listeners.get(type).push(fn);
    },
    getBoundingClientRect: () => ({
      left: 0, top: 0, width: el.width, height: el.height,
    }),
    closest: () => ({ style: {} }),
    click() {
      fire(el, 'click', {});
    },
  };
  return el;
}
function getEl(id) {
  if (!elements.has(id)) elements.set(id, makeElement(id));
  return elements.get(id);
}
const documentStub = {
  getElementById: (id) => getEl(id),
  createElement: (tag) => makeElement('<' + tag + '>'),
};

// ---------------------------------------------------------- fetch stub
const postCalls = [];
function fetchStub(path, opts) {
  if (opts && opts.method === 'POST') {
    postCalls.push([path, String(opts.body)]);
    return Promise.resolve({ ok: true });
  }
  if (path === '/state') {
    return Promise.resolve({
      ok: true,
      json: () => Promise.resolve(JSON.parse(JSON.stringify(statePayload))),
    });
  }
  return Promise.resolve({
    ok: true,
    json: () => Promise.resolve({}),
    blob: () => Promise.resolve({ size: 0 }),
  });
}

const intervals = [];
const setIntervalStub = (fn, _ms) => {
  intervals.push(fn);
  return intervals.length;
};
const URLStub = {
  createObjectURL: () => 'blob:stub',
  revokeObjectURL: () => {},
};

// ------------------------------------------------------------- execute
new Function('document', 'fetch', 'setInterval', 'URL', src)(
  documentStub, fetchStub, setIntervalStub, URLStub,
);

(async () => {
  // Let initControls' awaited /state fetch resolve.
  await new Promise((r) => setTimeout(r, 20));
  assert(intervals.length === 1, 'exactly one poll interval registered');
  const poll = intervals[0];

  // Hover a strip chart first so drawPlot's reticule branch (its final
  // statements) must execute — poll() swallows draw errors by design
  // ("server restarting"), so reaching fillText is the completion proof.
  fire(getEl('controlPlot'), 'mousemove', { clientX: 100, clientY: 40 });
  await poll();
  await poll();
  const status = getEl('status').textContent;
  assert(/tick=/.test(status), 'status line rendered, got: ' + status);
  assert(ctxCalls.includes('fillRect'), 'cart drawn (fillRect)');
  assert(ctxCalls.includes('stroke'), 'chain/plots stroked');
  assert(ctxCalls.includes('fillText'),
         'plot hover reticule completed (fillText)');

  // Mouse poke: press on the canvas, poll once while held.
  const canvas = getEl('cartPoleCanvas');
  fire(canvas, 'mousemove', { clientX: 400, clientY: 200 });
  fire(canvas, 'mousedown', { clientX: 400, clientY: 200 });
  await poll();
  fire(canvas, 'mouseup', {});
  assert(postCalls.some(([p]) => p === '/poke'), 'poke POSTed while held');

  // Slider -> /dynamics with the right field.
  const slider = getEl('baseMassSlider');
  slider.value = '1.23';
  fire(slider, 'input', {});
  assert(
    postCalls.some(([p, b]) => p === '/dynamics' && b.includes('m_b')),
    'baseMass slider POSTs m_b',
  );

  // Equality checkbox -> negative-weight convention on /optimization.
  const cb = getEl('thetaCostCheckbox');
  cb.checked = true;
  fire(cb, 'change', {});
  assert(
    postCalls.some(
      ([p, b]) => p === '/optimization'
        && b.includes('th_final_cost_weight') && b.includes('-1'),
    ),
    'equality checkbox POSTs the negative-weight convention',
  );

  // Controller toggle + reset + save buttons.
  const en = getEl('enableControllerCheckbox');
  en.checked = false;
  fire(en, 'change', {});
  assert(
    postCalls.some(([p, b]) => p === '/control' && b.includes('enabled')),
    'controller toggle POSTs /control',
  );
  fire(getEl('resetButton'), 'click', {});
  fire(getEl('saveLogButton'), 'click', {});
  await new Promise((r) => setTimeout(r, 20));
  assert(postCalls.some(([p]) => p === '/reset'), 'reset POSTed');

  console.log(
    `PAGE JS EXECUTION OK: ${ctxCalls.length} canvas ops, `
    + `${postCalls.length} POSTs, status="${status}"`,
  );
})().catch((e) => {
  console.error('PAGE JS HARNESS FAILED:', e && e.stack ? e.stack : e);
  process.exit(1);
});
