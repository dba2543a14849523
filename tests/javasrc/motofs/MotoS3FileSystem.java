package motofs;

/*
 * Test-support Hadoop FileSystem speaking the S3 REST API over plain
 * HTTP to an in-process moto server — NOT a production S3 client.
 *
 * Why it exists: this environment ships pyspark without the
 * hadoop-aws/aws-sdk jars and has no network to fetch them, so the
 * stock S3AFileSystem cannot be used to exercise the engine's
 * object-store data plane. Registering this class as `fs.s3a.impl`
 * lets Spark read and write parquet DATA over real S3 REST semantics
 * (ranged GETs, LIST v2 pagination, copy+delete rename, dir markers)
 * against the same moto endpoint the Python S3FileIO metadata layer
 * talks to — closing the gap between "metadata protocol tested" and
 * "data plane executed". In a real deployment the store runs on the
 * genuine hadoop-aws S3A connector; nothing in the engine depends on
 * this class.
 *
 * Auth: moto parses but does not validate SigV4, so a static header
 * shaped like a signature is sufficient (verified by probe).
 */

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FSDataInputStream;
import org.apache.hadoop.fs.FSDataOutputStream;
import org.apache.hadoop.fs.FSInputStream;
import org.apache.hadoop.fs.FileAlreadyExistsException;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.permission.FsPermission;
import org.apache.hadoop.util.Progressable;

import java.io.ByteArrayOutputStream;
import java.io.FileNotFoundException;
import java.io.IOException;
import java.io.InputStream;
import java.io.OutputStream;
import java.net.HttpURLConnection;
import java.net.URI;
import java.net.URL;
import java.net.URLEncoder;
import java.nio.charset.StandardCharsets;
import java.time.Instant;
import java.time.format.DateTimeFormatter;
import java.util.ArrayList;
import java.util.List;
import java.util.regex.Matcher;
import java.util.regex.Pattern;

public class MotoS3FileSystem extends FileSystem {

    private static final String AUTH =
        "AWS4-HMAC-SHA256 Credential=testing/20260101/us-east-1/s3/"
        + "aws4_request, SignedHeaders=host, Signature=motofs";

    private URI uri;
    private String endpoint;
    private String bucket;
    private Path workingDir;
    private long blockSize;

    @Override
    public void initialize(URI name, Configuration conf) throws IOException {
        super.initialize(name, conf);
        setConf(conf);
        this.uri = URI.create(name.getScheme() + "://" + name.getAuthority());
        this.bucket = name.getAuthority();
        String ep = conf.get("fs.s3a.endpoint");
        if (ep == null) {
            throw new IOException("fs.s3a.endpoint not set for " + name);
        }
        this.endpoint = ep.endsWith("/") ? ep.substring(0, ep.length() - 1) : ep;
        // core-default.xml ships "32M" — needs the suffix-aware parser
        this.blockSize = conf.getLongBytes("fs.s3a.block.size",
            32L * 1024 * 1024);
        this.workingDir = new Path("/").makeQualified(this.uri, null);
    }

    @Override
    public String getScheme() {
        return "s3a";
    }

    @Override
    public URI getUri() {
        return uri;
    }

    @Override
    public Path getWorkingDirectory() {
        return workingDir;
    }

    @Override
    public void setWorkingDirectory(Path dir) {
        workingDir = dir;
    }

    @Override
    public long getDefaultBlockSize(Path f) {
        return blockSize;
    }

    // -- HTTP plumbing ------------------------------------------------------

    private String key(Path p) {
        String s = p.toUri().getPath();
        while (s.startsWith("/")) {
            s = s.substring(1);
        }
        return s;
    }

    private static String enc(String key) {
        StringBuilder sb = new StringBuilder();
        for (String seg : key.split("/", -1)) {
            if (sb.length() > 0) {
                sb.append('/');
            }
            sb.append(URLEncoder.encode(seg, StandardCharsets.UTF_8)
                .replace("+", "%20"));
        }
        return sb.toString();
    }

    private HttpURLConnection conn(String method, String pathAndQuery)
            throws IOException {
        URL u = new URL(endpoint + pathAndQuery);
        HttpURLConnection c = (HttpURLConnection) u.openConnection();
        c.setRequestMethod(method);
        c.setRequestProperty("Authorization", AUTH);
        return c;
    }

    private String objPath(String k) {
        return "/" + bucket + "/" + enc(k);
    }

    private static void drain(HttpURLConnection c) {
        try {
            InputStream in = c.getResponseCode() >= 400
                ? c.getErrorStream() : c.getInputStream();
            if (in != null) {
                while (in.read() >= 0) { /* drain for keep-alive */ }
                in.close();
            }
        } catch (IOException ignored) {
            // draining is best-effort
        }
    }

    private static byte[] readAll(InputStream in) throws IOException {
        ByteArrayOutputStream out = new ByteArrayOutputStream();
        byte[] buf = new byte[8192];
        int n;
        while ((n = in.read(buf)) >= 0) {
            out.write(buf, 0, n);
        }
        in.close();
        return out.toByteArray();
    }

    /** HEAD an exact key; lenAndTime[0]=size, [1]=mtime millis. */
    private int head(String k, long[] lenAndTime) throws IOException {
        HttpURLConnection c = conn("HEAD", objPath(k));
        int status = c.getResponseCode();
        if (status == 200 && lenAndTime != null) {
            lenAndTime[0] = c.getContentLengthLong();
            lenAndTime[1] = c.getLastModified();
        }
        drain(c);
        return status;
    }

    private void putObject(String k, byte[] body) throws IOException {
        HttpURLConnection c = conn("PUT", objPath(k));
        c.setDoOutput(true);
        c.setFixedLengthStreamingMode(body.length);
        OutputStream out = c.getOutputStream();
        out.write(body);
        out.close();
        int status = c.getResponseCode();
        drain(c);
        if (status != 200) {
            throw new IOException("PUT " + k + " -> " + status);
        }
    }

    private void copyObject(String srcKey, String dstKey) throws IOException {
        HttpURLConnection c = conn("PUT", objPath(dstKey));
        c.setRequestProperty("x-amz-copy-source", "/" + bucket + "/" + enc(srcKey));
        int status = c.getResponseCode();
        drain(c);
        if (status != 200) {
            throw new IOException(
                "COPY " + srcKey + " -> " + dstKey + " -> " + status);
        }
    }

    private void deleteObject(String k) throws IOException {
        HttpURLConnection c = conn("DELETE", objPath(k));
        int status = c.getResponseCode();
        drain(c);
        if (status != 204 && status != 200 && status != 404) {
            throw new IOException("DELETE " + k + " -> " + status);
        }
    }

    // -- LIST v2 ------------------------------------------------------------

    private static final Pattern CONTENTS = Pattern.compile(
        "<Contents>.*?<Key>([^<]*)</Key>.*?<LastModified>([^<]*)"
        + "</LastModified>.*?<Size>(\\d+)</Size>.*?</Contents>",
        Pattern.DOTALL);
    private static final Pattern COMMON_PREFIX = Pattern.compile(
        "<CommonPrefixes><Prefix>([^<]*)</Prefix></CommonPrefixes>");
    private static final Pattern NEXT_TOKEN = Pattern.compile(
        "<NextContinuationToken>([^<]*)</NextContinuationToken>");

    private static final class Listing {
        final List<String[]> objects = new ArrayList<>(); // key, mtime, size
        final List<String> prefixes = new ArrayList<>();
    }

    private Listing list(String prefix, String delimiter, int maxPages)
            throws IOException {
        Listing res = new Listing();
        String token = null;
        for (int page = 0; page < maxPages; page++) {
            StringBuilder q = new StringBuilder("/" + bucket
                + "?list-type=2&prefix="
                + URLEncoder.encode(prefix, StandardCharsets.UTF_8));
            if (delimiter != null) {
                q.append("&delimiter=")
                 .append(URLEncoder.encode(delimiter, StandardCharsets.UTF_8));
            }
            if (token != null) {
                q.append("&continuation-token=")
                 .append(URLEncoder.encode(token, StandardCharsets.UTF_8));
            }
            HttpURLConnection c = conn("GET", q.toString());
            int status = c.getResponseCode();
            if (status != 200) {
                drain(c);
                throw new IOException("LIST " + prefix + " -> " + status);
            }
            String xml = new String(readAll(c.getInputStream()),
                StandardCharsets.UTF_8);
            Matcher m = CONTENTS.matcher(xml);
            while (m.find()) {
                res.objects.add(new String[] {
                    xmlUnescape(m.group(1)), m.group(2), m.group(3)});
            }
            m = COMMON_PREFIX.matcher(xml);
            while (m.find()) {
                res.prefixes.add(xmlUnescape(m.group(1)));
            }
            m = NEXT_TOKEN.matcher(xml);
            if (xml.contains("<IsTruncated>true</IsTruncated>") && m.find()) {
                token = m.group(1);
            } else {
                return res;
            }
        }
        throw new IOException("LIST " + prefix + ": unbounded pagination");
    }

    private static String xmlUnescape(String s) {
        return s.replace("&amp;", "&").replace("&lt;", "<")
            .replace("&gt;", ">").replace("&quot;", "\"")
            .replace("&#39;", "'");
    }

    private static long parseTime(String iso) {
        try {
            return Instant.from(
                DateTimeFormatter.ISO_OFFSET_DATE_TIME.parse(iso))
                .toEpochMilli();
        } catch (RuntimeException e) {
            return 0L;
        }
    }

    // -- FileSystem surface --------------------------------------------------

    private FileStatus dirStatus(Path f) {
        return new FileStatus(0, true, 1, blockSize, 0L, makeQualified(f));
    }

    @Override
    public FileStatus getFileStatus(Path f) throws IOException {
        String k = key(f);
        if (k.isEmpty()) {
            return dirStatus(f);
        }
        long[] lt = new long[2];
        if (head(k, lt) == 200) {
            return new FileStatus(lt[0], false, 1, blockSize, lt[1],
                makeQualified(f));
        }
        if (head(k + "/", null) == 200) {
            return dirStatus(f);
        }
        Listing l = list(k + "/", "/", 1);
        if (!l.objects.isEmpty() || !l.prefixes.isEmpty()) {
            return dirStatus(f);
        }
        throw new FileNotFoundException(f.toString());
    }

    @Override
    public FileStatus[] listStatus(Path f) throws IOException {
        FileStatus st = getFileStatus(f); // throws FNF if absent
        if (st.isFile()) {
            return new FileStatus[] {st};
        }
        String k = key(f);
        String prefix = k.isEmpty() ? "" : k + "/";
        Listing l = list(prefix, "/", 1000);
        List<FileStatus> out = new ArrayList<>();
        for (String[] obj : l.objects) {
            if (obj[0].equals(prefix)) {
                continue; // the dir marker itself
            }
            String name = obj[0].substring(prefix.length());
            out.add(new FileStatus(Long.parseLong(obj[2]), false, 1,
                blockSize, parseTime(obj[1]),
                makeQualified(new Path(f, name))));
        }
        for (String p : l.prefixes) {
            String name = p.substring(prefix.length(), p.length() - 1);
            out.add(dirStatus(new Path(f, name)));
        }
        return out.toArray(new FileStatus[0]);
    }

    @Override
    public FSDataInputStream open(Path f, int bufferSize) throws IOException {
        FileStatus st = getFileStatus(f);
        if (st.isDirectory()) {
            throw new FileNotFoundException("is a directory: " + f);
        }
        return new FSDataInputStream(new RangedInput(key(f), st.getLen()));
    }

    /** Seekable input over ranged GETs — one HTTP request per read call
     * (parquet's own buffering makes reads chunk-sized, so request
     * counts stay proportional to column chunks, not bytes). */
    private final class RangedInput extends FSInputStream {
        private final String k;
        private final long len;
        private long pos = 0;

        RangedInput(String k, long len) {
            this.k = k;
            this.len = len;
        }

        @Override
        public synchronized int read(byte[] b, int off, int n)
                throws IOException {
            if (n == 0) {
                return 0;
            }
            if (pos >= len) {
                return -1;
            }
            long end = Math.min(len - 1, pos + n - 1);
            HttpURLConnection c = conn("GET", objPath(k));
            c.setRequestProperty("Range", "bytes=" + pos + "-" + end);
            int status = c.getResponseCode();
            if (status != 206 && status != 200) {
                drain(c);
                throw new IOException("GET " + k + " [" + pos + "-" + end
                    + "] -> " + status);
            }
            InputStream in = c.getInputStream();
            int want = (int) (end - pos + 1);
            int total = 0;
            while (total < want) {
                int r = in.read(b, off + total, want - total);
                if (r < 0) {
                    break;
                }
                total += r;
            }
            in.close();
            if (total == 0) {
                return -1;
            }
            pos += total;
            return total;
        }

        @Override
        public synchronized int read() throws IOException {
            byte[] one = new byte[1];
            int r = read(one, 0, 1);
            return r <= 0 ? -1 : one[0] & 0xff;
        }

        @Override
        public synchronized void seek(long p) throws IOException {
            if (p < 0 || p > len) {
                throw new IOException("seek " + p + " outside [0," + len + "]");
            }
            pos = p;
        }

        @Override
        public synchronized long getPos() {
            return pos;
        }

        @Override
        public boolean seekToNewSource(long targetPos) {
            return false;
        }
    }

    @Override
    public FSDataOutputStream create(Path f, FsPermission permission,
            boolean overwrite, int bufferSize, short replication,
            long bs, Progressable progress) throws IOException {
        String k = key(f);
        if (!overwrite) {
            try {
                getFileStatus(f);
                throw new FileAlreadyExistsException(f.toString());
            } catch (FileNotFoundException expected) {
                // proceed
            }
        }
        ByteArrayOutputStream buf = new ByteArrayOutputStream();
        OutputStream sink = new OutputStream() {
            private boolean closed = false;

            @Override
            public void write(int b) {
                buf.write(b);
            }

            @Override
            public void write(byte[] b, int off, int n) {
                buf.write(b, off, n);
            }

            @Override
            public void close() throws IOException {
                if (closed) {
                    return;
                }
                closed = true;
                putObject(k, buf.toByteArray());
            }
        };
        return new FSDataOutputStream(sink, statistics);
    }

    @Override
    public FSDataOutputStream append(Path f, int bufferSize,
            Progressable progress) {
        throw new UnsupportedOperationException("append is not part of S3");
    }

    @Override
    public boolean mkdirs(Path f, FsPermission permission) throws IOException {
        for (Path p = f; p != null && !key(p).isEmpty(); p = p.getParent()) {
            String k = key(p);
            if (head(k, null) == 200) {
                throw new FileAlreadyExistsException(
                    p + " exists as a file");
            }
            if (head(k + "/", null) != 200) {
                putObject(k + "/", new byte[0]);
            }
        }
        return true;
    }

    @Override
    public boolean delete(Path f, boolean recursive) throws IOException {
        FileStatus st;
        try {
            st = getFileStatus(f);
        } catch (FileNotFoundException e) {
            return false;
        }
        String k = key(f);
        if (st.isFile()) {
            deleteObject(k);
            return true;
        }
        Listing l = list(k.isEmpty() ? "" : k + "/", null, 1000);
        if (!recursive) {
            for (String[] obj : l.objects) {
                if (!obj[0].equals(k + "/")) {
                    throw new IOException(f + " is a non-empty directory");
                }
            }
        }
        for (String[] obj : l.objects) {
            deleteObject(obj[0]);
        }
        if (!k.isEmpty()) {
            deleteObject(k + "/");
        }
        return true;
    }

    @Override
    public boolean rename(Path src, Path dst) throws IOException {
        FileStatus s;
        try {
            s = getFileStatus(src);
        } catch (FileNotFoundException e) {
            return false;
        }
        try {
            FileStatus d = getFileStatus(dst);
            if (d.isDirectory()) {
                dst = new Path(dst, src.getName());
                try {
                    getFileStatus(dst);
                    return false; // dst/srcName already exists
                } catch (FileNotFoundException expected) {
                    // proceed
                }
            } else {
                return false; // dst exists as a file
            }
        } catch (FileNotFoundException expected) {
            // plain move to dst
        }
        String sk = key(src);
        String dk = key(dst);
        if (s.isFile()) {
            copyObject(sk, dk);
            deleteObject(sk);
            return true;
        }
        Listing l = list(sk + "/", null, 1000);
        for (String[] obj : l.objects) {
            String suffix = obj[0].substring(sk.length());
            copyObject(obj[0], dk + suffix);
            deleteObject(obj[0]);
        }
        deleteObject(sk + "/");
        if (head(dk + "/", null) != 200) {
            putObject(dk + "/", new byte[0]); // dir survives even if empty
        }
        return true;
    }
}
